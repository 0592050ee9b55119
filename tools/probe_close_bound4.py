"""Round-3 probe #4: per-bucket breakdown on the power-law graph.

probe_close_bound3.py: bucket layout wins on uniform Poisson (32.6 vs
37.9 ms) but loses on Zipf(1.6) (46.5 vs 37.2) with 18 ms of non-gather
overhead vs 6.6 on uniform. Times each bucket's gather and full
(gather+mask+reduce) separately to find which shape triggers the slow
path, plus the top-bucket segment and the final concat+perm.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.probe_close_bound3 import build_buckets  # noqa: E402

V, F = 232_965, 128


def timeit(fn, args, iters=10, tag="", edges=1):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7 % out.size].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:58s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    E = V * 50
    raw = rng.zipf(1.6, V).astype(np.int64)
    raw = np.minimum(raw, 200_000)
    deg = np.maximum((raw * (E / raw.sum())).astype(np.int64), 0)
    e_pl = int(deg.sum())
    dst = np.repeat(np.arange(V, dtype=np.int32), deg)
    src = rng.integers(0, V, e_pl).astype(np.int32)

    h = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.float32)
    buckets, top, inv, slots = build_buckets(src, dst, V, 32)
    print(f"V={V} E={e_pl} slots={slots/1e6:.2f}M")

    tot_g = tot_f = 0.0
    for rows, cnt, vb in buckets:
        rj, cj = jnp.asarray(rows), jnp.asarray(cnt)
        w = rows.shape[1]
        eb = int(cnt.sum())

        def g_fn(c, h, s):
            return (h * (1 + c * 1e-20)).astype(jnp.bfloat16)[s]

        def f_fn(c, h, s, cnt, w=w):
            hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
            msgs = hb[s]
            mask = (jax.lax.iota(jnp.int32, w)[None, :]
                    < cnt[:, None]).astype(msgs.dtype)
            return (msgs * mask[..., None]).sum(axis=1, dtype=jnp.float32)

        tag = f"bucket ({len(vb):7d} x {w:3d}) {eb/1e6:5.2f}M edges"
        tot_g += timeit(g_fn, (h, rj), tag=f"  {tag} | gather", edges=eb)
        tot_f += timeit(f_fn, (h, rj, cj), tag=f"  {tag} | full", edges=eb)

    if top is not None:
        rows, cnt, rv, hubs = top
        rj, cj, rvj = jnp.asarray(rows), jnp.asarray(cnt), jnp.asarray(rv)
        w = rows.shape[1]
        eb = int(cnt.sum())
        n_hubs = len(hubs)

        def g_fn(c, h, s):
            return (h * (1 + c * 1e-20)).astype(jnp.bfloat16)[s]

        def f_fn(c, h, s, cnt, rv):
            hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
            msgs = hb[s]
            mask = (jax.lax.iota(jnp.int32, w)[None, :]
                    < cnt[:, None]).astype(msgs.dtype)
            part = (msgs * mask[..., None]).sum(axis=1, dtype=jnp.float32)
            return jax.ops.segment_sum(part, rv, num_segments=n_hubs,
                                       indices_are_sorted=True)

        tag = f"top    ({rows.shape[0]:7d} x {w:3d}) {eb/1e6:5.2f}M edges"
        tot_g += timeit(g_fn, (h, rj), tag=f"  {tag} | gather", edges=eb)
        tot_f += timeit(f_fn, (h, rj, cj, rvj), tag=f"  {tag} | full+seg",
                        edges=eb)

    print(f"\n  sum of bucket gathers: {tot_g*1e3:.3f} ms")
    print(f"  sum of bucket fulls:   {tot_f*1e3:.3f} ms")

    # concat + inverse permutation alone.
    sizes = [len(b[2]) for b in buckets] + ([len(top[3])] if top else [])
    outs = [jax.random.normal(jax.random.PRNGKey(i), (s, F), jnp.float32)
            for i, s in enumerate(sizes)]
    invj = jnp.asarray(inv)

    def permute(c, inv, *outs):
        cat = jnp.concatenate([o * (1 + c * 1e-20) for o in outs]
                              + [jnp.zeros((1, F), jnp.float32)])
        return cat[inv]

    timeit(permute, (invj, *outs), tag="  concat + inverse perm", edges=e_pl)


if __name__ == "__main__":
    main()
