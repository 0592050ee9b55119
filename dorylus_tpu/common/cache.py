"""Persistent XLA compilation cache.

Compiles are the dominant fixed cost of this framework on the remote-TPU
tunnel backend (a Reddit-scale GAT+hyb in-scan group compiles ~14 min;
bench.py spends most of its ~25 min wall in compiles). JAX's persistent
compilation cache serializes compiled executables keyed on the HLO +
compile options, so every program SHAPE is paid once per machine, ever —
verified working through the axon tunnel by tools/probe_compile_cache.py
(chain program: 2.06 s cold -> 0.18 s warm across processes).

The reference has no analog (every dorylus run re-JITs nothing — it's
ahead-of-time C++ — so compile latency is a TPU-stack cost we remove
rather than a parity feature).

Enabled by default from the engines, the CLI, and bench.py. Opt out with
DORYLUS_COMPILE_CACHE=off or --compile-cache off.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = "~/.cache/dorylus_tpu/xla"
_enabled_path: Optional[str] = None


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    path=None resolves DORYLUS_COMPILE_CACHE, else the default user cache
    dir. "off"/"none"/"" disables (returns None). Only compiles slower
    than 2 s are cached, so test-sized programs never churn the dir.
    """
    global _enabled_path
    if path is None:
        path = os.environ.get("DORYLUS_COMPILE_CACHE", _DEFAULT_DIR)
    if not path or path.lower() in ("off", "none"):
        return None
    path = os.path.expanduser(path)
    if _enabled_path == path:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # Cache read/write failures must never fail a run.
    jax.config.update("jax_raise_persistent_cache_errors", False)
    _enabled_path = path
    return path
