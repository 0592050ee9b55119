"""Does JAX's persistent compilation cache work through the axon tunnel?

GAT+hyb at Reddit scale compiles ~14 min in-scan (CLAUDE.md). If the
persistent cache can serialize tunnel-TPU executables, that cost is paid
once per program shape EVER (across processes), not per run — bench.py
and the CLI would warm-start. Run this twice in separate processes:

    python tools/probe_compile_cache.py /tmp/xla_cache

First run: slow compile, cache file appears. Second run: fast.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xla_cache_probe"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_raise_persistent_cache_errors", False)

    # A compile-heavy program: unrolled chain of mixed-shape matmuls.
    k = jax.random.PRNGKey(0)
    xs = [jax.random.normal(jax.random.fold_in(k, i),
                            (256 + 8 * i, 256 + 8 * (i + 1)), jnp.float32)
          for i in range(40)]

    @jax.jit
    def chain(xs):
        acc = jnp.zeros((256, 256 + 8 * 40), jnp.float32)
        h = jnp.eye(256, 256 + 8 * 0, dtype=jnp.float32)
        for x in xs:
            h = jnp.tanh(h @ x)
        return h

    t0 = time.perf_counter()
    out = chain(xs)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"platform={jax.devices()[0].platform} "
          f"first-call (compile+run): {t1 - t0:.2f}s", flush=True)
    files = sorted(Path(cache_dir).glob("*"))
    print(f"cache entries: {len(files)}")
    for f in files[:5]:
        print("  ", f.name[:60], f.stat().st_size)


if __name__ == "__main__":
    main()
