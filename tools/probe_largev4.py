"""Large-V: force the fast gather via barrier'd slot chunks.

probe_gather_bigmode3.py: the ~420 M rows/s DMA gather engages only when
the gather is NOT fused into its consumer AND its index count <= table
rows; fused-into-reduce gathers run at 141 M rows/s regardless. So chunk
the slot grid to <= V indices per chunk and materialize each chunk's
messages with an optimization_barrier before the reduce. Candidate rates
at V=1.6M E=24M (34.2M slots): 23 chunks x ~6.5 ms ~= 150 ms vs the
289 ms fused baseline.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan  # noqa: E402

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
    except Exception as ex:  # noqa: BLE001
        print(f"{tag:52s}: FAILED {type(ex).__name__}: {str(ex)[:70]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:52s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def degree_chunked_barrier(c, hb, pl, vv, rc, pad_rows=0):
    """Degree pass with scan over slot-row chunks; each chunk's gathered
    messages pass an optimization_barrier so XLA materializes them with
    the standalone (DMA) gather lowering."""
    hh = hb * (1 + c * 1e-20)
    if pad_rows:
        hh = jnp.pad(hh, ((0, pad_rows - hh.shape[0]), (0, 0)))
    val_ext = jnp.concatenate([vv, jnp.zeros((1,), jnp.float32)])
    vals = val_ext[pl["slot_to_edge"]]  # (R, B)
    r = pl["slot_src"].shape[0]
    n = -(-r // rc)
    pad = n * rc - r
    ss = jnp.pad(pl["slot_src"], ((0, pad), (0, 0))).reshape(n, rc, -1)
    vs = jnp.pad(vals, ((0, pad), (0, 0))).reshape(n, rc, -1)

    def body(_, ch):
        s, v = ch
        msgs = jax.lax.optimization_barrier(hh[s])
        return None, (msgs * v[..., None].astype(msgs.dtype)).sum(
            axis=1, dtype=jnp.float32)

    _, parts = jax.lax.scan(body, None, (ss, vs))
    part = parts.reshape(n * rc, -1)[:r]
    return jax.ops.segment_sum(part, pl["block_row"], num_segments=V,
                               indices_are_sorted=True)


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = np.sort(rng.integers(0, V, E).astype(np.int32))
    p = build_degree_plan(src, dst, None, V, 16, out_block_rows=0)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    hb = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.bfloat16)
    val = jnp.asarray(rng.normal(0, 1e-3, E).astype(np.float32))
    print("fused baseline: 288.96 ms / 83.1 M edges/s (probe_largev3)",
          flush=True)
    # chunks of 93750 block rows = 1.5M slots <= V
    timeit(lambda c, h, pl, vv: degree_chunked_barrier(c, h, pl, vv, 93_750),
           (hb, p, val), tag="barrier-chunk 1.5M slots")
    # table padded to 4.19M rows, chunks of 4M slots (bigger N amortizes)
    timeit(lambda c, h, pl, vv: degree_chunked_barrier(
        c, h, pl, vv, 250_000, pad_rows=4_194_304),
        (hb, p, val), tag="barrier-chunk 4M slots, table padded 4.19M")
    # no barrier control (should match the slow fused-ish rate)
    def no_barrier(c, h, pl, vv):
        hh = h * (1 + c * 1e-20)
        val_ext = jnp.concatenate([vv, jnp.zeros((1,), jnp.float32)])
        vals = val_ext[pl["slot_to_edge"]]
        r = pl["slot_src"].shape[0]
        rc = 93_750
        n = -(-r // rc)
        pad = n * rc - r
        ss = jnp.pad(pl["slot_src"], ((0, pad), (0, 0))).reshape(n, rc, -1)
        vs = jnp.pad(vals, ((0, pad), (0, 0))).reshape(n, rc, -1)

        def body(_, ch):
            s, v = ch
            msgs = hh[s]
            return None, (msgs * v[..., None].astype(msgs.dtype)).sum(
                axis=1, dtype=jnp.float32)

        _, parts = jax.lax.scan(body, None, (ss, vs))
        part = parts.reshape(n * rc, -1)[:r]
        return jax.ops.segment_sum(part, pl["block_row"], num_segments=V,
                                   indices_are_sorted=True)

    timeit(no_barrier, (hb, p, val), tag="chunk 1.5M slots NO barrier")


if __name__ == "__main__":
    main()
