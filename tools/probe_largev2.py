"""Large-V (V=1.6M, E=24M, F=128) degree-kernel variant matrix.

Round-1 left this regime with no winning kernel (degree chunked 41.6M
edges/s < edgewise 68.6M; unchunked f32 OOMed at 17.5GB HLO temp). Round-2
levers to test, independently:
  - row_chunk OFF (does the gather->reduce fusion hold at this scale, or
    does XLA materialize the (R,B,F) message tensor? bf16 messages are
    6.5 GB vs 13 GB f32 — the f32 OOM may simply not apply to bf16)
  - out_block_rows ON/OFF (is the large-V "segment_sum cliff" real, or was
    round-1's 12x reading the backward scatter, as PARITY suspects?)
  - f32 vs bf16 narrow gather (tools/probe_bf16_gather.py: 1.75x at Reddit
    scale, zero effect at large V because the row_chunk guard engaged)
Risky (possibly-OOM) variants run LAST.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan, _degree_pass  # noqa: E402

V, F = 1_600_000, 128
E = 24_000_000


def timeit(fn, args, iters=5, tag="", edges=E):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        float(loop(*args))
    except Exception as ex:  # noqa: BLE001 — OOM reporting is the point
        print(f"{tag:44s}: FAILED {type(ex).__name__}: {str(ex)[:90]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:44s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (V, F), jnp.float32)
    hb = h.astype(jnp.bfloat16)
    val = jnp.asarray(rng.normal(0, 1e-3, E).astype(np.float32))
    print(f"V={V} E={E} F={F}", flush=True)

    def mkplan(obr):
        p = build_degree_plan(src, dst, None, V, 16, out_block_rows=obr)
        p.pop("_out_block_rows", None)
        return {k: jnp.asarray(v) for k, v in p.items()}

    p_blk = mkplan(None)   # auto: 131072-row blocked final reduce
    p_flat = mkplan(0)     # plain segment_sum over 1.6M rows

    def run(c, h, plan, vv, gd, rc, obr):
        return _degree_pass(h * (1 + c * 1e-20), plan, V, vv,
                            row_chunk=rc, gather_dtype=gd,
                            out_block_rows=obr)

    # Chunked baselines measured in tools/probe_bf16_gather.py: 577.9 ms
    # (41.5 M edges/s) regardless of dtype — the scan path dominates.
    # Plans/vals ride the loop ARGUMENTS (closure constants hit the remote
    # compiler's payload limit, HTTP 413 — see CLAUDE.md).
    # Unchunked bf16 (6.5 GB worst case if materialized)
    timeit(lambda c, hh, pl, vv: run(c, hh, pl, vv, jnp.bfloat16, 0, 131072),
           (hb, p_blk, val), tag="unchunked+obr bf16")
    timeit(lambda c, hh, pl, vv: run(c, hh, pl, vv, jnp.bfloat16, 0, 0),
           (hb, p_flat, val), tag="unchunked flat-segsum bf16")
    # Unchunked f32 (13 GB if materialized — the round-1 OOM; run last)
    timeit(lambda c, hh, pl, vv: run(c, hh, pl, vv, None, 0, 0),
           (h, p_flat, val), tag="unchunked flat-segsum f32")
    timeit(lambda c, hh, pl, vv: run(c, hh, pl, vv, None, 0, 131072),
           (h, p_blk, val), tag="unchunked+obr f32")


if __name__ == "__main__":
    main()
