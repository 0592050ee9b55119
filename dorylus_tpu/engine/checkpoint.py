"""Checkpoint / resume — an improvement over the reference, which restarts
training from scratch (SURVEY §5: no model-state checkpointing; its only
caches are preprocessed partitions and feature files)."""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str | Path, step: int, params: Any,
                    opt_state: Any = None, extra: Optional[dict] = None) -> Path:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"ckpt_{step:08d}.pkl"
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump({
            "step": step,
            "params": _to_host(params),
            "opt_state": _to_host(opt_state) if opt_state is not None else None,
            "extra": extra or {},
        }, f)
    tmp.rename(path)  # atomic publish
    (d / "LATEST").write_text(path.name)
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Optional[Path]:
    d = Path(ckpt_dir)
    marker = d / "LATEST"
    if marker.exists():
        p = d / marker.read_text().strip()
        if p.exists():
            return p
    cands = sorted(d.glob("ckpt_*.pkl"))
    return cands[-1] if cands else None


def load_checkpoint(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
