"""Checkpoint / resume — an improvement over the reference, which restarts
training from scratch (SURVEY §5: no model-state checkpointing; its only
caches are preprocessed partitions and feature files).

Format: a single .npz per checkpoint (np.savez, no pickled code objects —
a checkpoint dir pointed at by --checkpoint-dir is untrusted input and must
not execute anything on load). Array keys are namespaced:

    params/<name>          model parameters (flat name -> array dict)
    opt/step, opt/m|v/<name>   AdamState (absent for SGD runs)
    __meta__               JSON blob: step + caller extras
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import numpy as np


def _to_host(tree: Any) -> Any:
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str | Path, step: int, params: dict,
                    opt_state: Any = None, extra: Optional[dict] = None) -> Path:
    from dorylus_tpu.optim.adam import AdamState

    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"ckpt_{step:08d}.npz"
    # Dotfile temp name: the latest_checkpoint glob (ckpt_*.npz) must
    # never match a partially-written file — the old ckpt_N.tmp.npz name
    # matched AND sorted after complete checkpoints, so a crash mid-write
    # made resume load a truncated npz (round-5 review).
    tmp = d / f".ckpt_{step:08d}.npz.tmp"

    arrays: dict[str, np.ndarray] = {}
    for name, w in _to_host(params).items():
        arrays[f"params/{name}"] = w
    if opt_state is not None:
        assert isinstance(opt_state, AdamState), type(opt_state)
        arrays["opt/step"] = np.asarray(opt_state.step)
        for name, m in _to_host(opt_state.m).items():
            arrays[f"opt/m/{name}"] = m
        for name, v in _to_host(opt_state.v).items():
            arrays[f"opt/v/{name}"] = v
    meta = {"step": int(step), "extra": extra or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)

    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.rename(path)  # atomic publish
    # LATEST published atomically too: a crash mid-write_text left an
    # empty marker that resolved to the DIRECTORY and broke resume.
    ltmp = d / ".LATEST.tmp"
    ltmp.write_text(path.name)
    ltmp.rename(d / "LATEST")
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Optional[Path]:
    d = Path(ckpt_dir)
    marker = d / "LATEST"
    if marker.exists():
        name = marker.read_text().strip()
        if name:  # empty marker would resolve to the directory itself
            p = d / name
            if p.is_file():
                return p
    cands = sorted(p for p in d.glob("ckpt_*.npz")
                   if not p.name.endswith(".tmp.npz"))  # pre-fix leftovers
    return cands[-1] if cands else None


def load_checkpoint(path: str | Path) -> dict:
    """Returns {"step", "params", "opt_state", "extra"} — the same shape
    the engines consume. allow_pickle stays False (trust boundary)."""
    from dorylus_tpu.optim.adam import AdamState

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        params = {k.split("/", 1)[1]: z[k] for k in z.files
                  if k.startswith("params/")}
        opt_state = None
        if "opt/step" in z.files:
            m = {k.split("/", 2)[2]: z[k] for k in z.files
                 if k.startswith("opt/m/")}
            v = {k.split("/", 2)[2]: z[k] for k in z.files
                 if k.startswith("opt/v/")}
            opt_state = AdamState(step=z["opt/step"], m=m, v=v)
    return {"step": meta["step"], "params": params, "opt_state": opt_state,
            "extra": meta["extra"]}
