"""Round-3 headline probe #3: bucket-kernel design choices.

probe_close_bound2.py: bucket-per-vertex = 32.8 ms (31.3 no-perm) vs
current 38.1; the remaining over-bound cost is the msgs HBM round trip
(gather writes (slots,F), reduce re-reads it at ~660 GB/s) — XLA's fused
gather+reduce path is 2x SLOWER (it materializes an f32 convert of the
messages), so two passes is the floor for an XLA kernel.

This probe settles the production design:
  1. reduce variants that might fuse better: einsum on MXU,
     reduce_window (stride-w sum pooling);
  2. finer buckets (more quantiles) — pad 7.8% -> ~7.0%;
  3. POWER-LAW graph (Zipf-ish degrees, the real-graph shape): bucket
     widths capped at W, hub vertices spill rows into a top bucket
     reduced by a short sorted segment_sum. Compares bucket vs the
     current block=16 degree kernel on the same graph.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.ops.degree_spmm import build_degree_plan  # noqa: E402

V, F = 232_965, 128
E = V * 50


def timeit(fn, args, iters=10, tag="", edges=E):
    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:56s}: {dt*1e3:9.3f} ms  {edges/dt/1e6:7.1f} M edges/s",
          flush=True)
    return dt


def build_buckets(src, dst, num_v, n_q=16, max_w=512):
    """Host-side bucket construction. Returns (buckets, top, inv, slots):
    buckets = [(rows (Vb,w) int32, cnt (Vb,) int32, vb vertex ids)] for
    vertices with deg <= max_w (one row per vertex, width from degree
    quantiles rounded to x8); top = (rows (Rt,max_w), row_vertex (Rt,),
    vt ids) for hubs, needing a segment reduce. inv = (V,) position of
    each vertex in the concatenated outputs (isolated verts -> sentinel).
    """
    deg = np.bincount(dst, minlength=num_v)
    estart = np.zeros(num_v + 1, np.int64)
    np.cumsum(deg, out=estart[1:])
    order = np.argsort(deg, kind="stable")
    deg_s = deg[order]
    # Skip isolated vertices entirely.
    first = int(np.searchsorted(deg_s, 1))
    active = order[first:]
    deg_a = deg_s[first:]
    hub_lo = int(np.searchsorted(deg_a, max_w, side="right"))
    normal, hubs = active[:hub_lo], active[hub_lo:]
    deg_n = deg_a[:hub_lo]

    qs = np.quantile(deg_n, np.linspace(0, 1, n_q + 1)[1:]) if len(deg_n) else []
    widths = sorted(set(int(-(-int(q) // 8) * 8) for q in qs))
    buckets = []
    slots = 0
    lo = 0
    for w in widths:
        hi = int(np.searchsorted(deg_n, w, side="right"))
        vb = normal[lo:hi]
        lo = hi
        if len(vb) == 0:
            continue
        rows = np.zeros((len(vb), w), np.int32)
        cnt = deg[vb].astype(np.int32)
        # Vectorized fill: flat positions per vertex run.
        tot = int(cnt.sum())
        rstart = np.zeros(len(vb) + 1, np.int64)
        np.cumsum(cnt, out=rstart[1:])
        ridx = np.repeat(np.arange(len(vb)), cnt)
        cidx = np.arange(tot) - rstart[ridx]
        eidx = estart[vb][ridx] + cidx
        rows[ridx, cidx] = src[eidx]
        buckets.append((rows, cnt, vb))
        slots += rows.size
    top = None
    if len(hubs):
        nrow = -(-deg[hubs] // max_w)
        rt = int(nrow.sum())
        rows = np.zeros((rt, max_w), np.int32)
        cntr = np.zeros(rt, np.int32)
        row_vertex = np.repeat(np.arange(len(hubs)), nrow)
        r0 = 0
        for i, vtx in enumerate(hubs):
            d = deg[vtx]
            ed = src[estart[vtx]:estart[vtx] + d]
            nr = -(-d // max_w)
            pad = nr * max_w - d
            rows[r0:r0 + nr] = np.pad(ed, (0, pad)).reshape(nr, max_w)
            full, rem = divmod(d, max_w)
            cntr[r0:r0 + full] = max_w
            if rem:
                cntr[r0 + full] = rem
            r0 += nr
        top = (rows, cntr, row_vertex.astype(np.int32), hubs)
        slots += rows.size
    # Output layout: [buckets... , hubs, zero row]; inv maps vertex->pos.
    n_out = sum(len(b[2]) for b in buckets) + (len(hubs) if top else 0)
    inv = np.full(num_v, n_out, np.int64)  # isolated -> zero sentinel
    pos = 0
    for _, _, vb in buckets:
        inv[vb] = np.arange(pos, pos + len(vb))
        pos += len(vb)
    if top is not None:
        inv[top[3]] = np.arange(pos, pos + len(top[3]))
    return buckets, top, inv, slots


def bucket_apply(c, h, inv, n_hubs, flat):
    hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
    outs = []
    i = 0
    while i < len(flat):
        kind = flat[i]
        if kind == 0:  # bucket: rows, cnt
            s, cnt = flat[i + 1], flat[i + 2]
            i += 3
            w = s.shape[1]
            msgs = hb[s]
            mask = (jax.lax.iota(jnp.int32, w)[None, :]
                    < cnt[:, None]).astype(msgs.dtype)
            outs.append((msgs * mask[..., None]).sum(axis=1,
                                                     dtype=jnp.float32))
        else:  # top: rows, cnt, row_vertex
            s, cnt, rv = flat[i + 1], flat[i + 2], flat[i + 3]
            i += 4
            w = s.shape[1]
            msgs = hb[s]
            mask = (jax.lax.iota(jnp.int32, w)[None, :]
                    < cnt[:, None]).astype(msgs.dtype)
            part = (msgs * mask[..., None]).sum(axis=1, dtype=jnp.float32)
            outs.append(jax.ops.segment_sum(part, rv, num_segments=n_hubs,
                                            indices_are_sorted=True))
    cat = jnp.concatenate(outs + [jnp.zeros((1, h.shape[1]), jnp.float32)])
    return cat[inv]


def flatten(buckets, top):
    flat = []
    for rows, cnt, _ in buckets:
        flat += [0, jnp.asarray(rows), jnp.asarray(cnt)]
    if top is not None:
        flat += [1, jnp.asarray(top[0]), jnp.asarray(top[1]),
                 jnp.asarray(top[2])]
    return flat


def run_graph(tag, src, dst, num_v, edges):
    h = jax.random.normal(jax.random.PRNGKey(0), (num_v, F), jnp.float32)
    deg = np.bincount(dst, minlength=num_v)
    print(f"\n--- {tag}: V={num_v} E={edges} maxdeg={deg.max()} ---",
          flush=True)

    for n_q in (16, 32):
        buckets, top, inv, slots = build_buckets(src, dst, num_v, n_q)
        n_hubs = len(top[3]) if top else 0
        flat = flatten(buckets, top)
        print(f"  n_q={n_q}: buckets={len(buckets)} hubs={n_hubs} "
              f"slots={slots/1e6:.2f}M pad={slots/edges-1:.1%}")
        # Close over the int markers, pass arrays positionally.
        arrs = [x for x in flat if not isinstance(x, int)]
        kinds = [x for x in flat if isinstance(x, int)]

        def apply_fn(c, h, inv, *arrs, kinds=tuple(kinds)):
            fl = []
            it = iter(arrs)
            for k in kinds:
                fl.append(k)
                fl.append(next(it))
                fl.append(next(it))
                if k == 1:
                    fl.append(next(it))
            return bucket_apply(c, h, inv, n_hubs, fl)

        timeit(apply_fn, (h, jnp.asarray(inv), *arrs),
               tag=f"  bucket full n_q={n_q}", edges=edges)

        # Gather bound on the same slot arrays.
        def bound_fn(c, h, *arrs, kinds=tuple(kinds)):
            hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
            acc = jnp.float32(0)
            it = iter(arrs)
            for k in kinds:
                s = next(it)
                next(it)
                if k == 1:
                    next(it)
                acc = acc + hb[s].ravel()[3].astype(jnp.float32)
            return jnp.reshape(acc, (1,))

        timeit(bound_fn, (h, *arrs), tag=f"  bound n_q={n_q}", edges=edges)

    # Reference: current block=16 static-vals style pass.
    plan = build_degree_plan(src, dst, None, num_v, 16)
    vals = np.zeros(plan["slot_to_edge"].shape, np.float32)
    live = plan["slot_to_edge"] != edges
    vals[live] = 1e-3
    slot_src = jnp.asarray(plan["slot_src"])
    block_row = jnp.asarray(plan["block_row"])
    valj = jnp.asarray(vals)

    def current(c, h, s, v, br):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        part = (msgs * v[..., None].astype(msgs.dtype)).sum(
            axis=1, dtype=jnp.float32)
        return jax.ops.segment_sum(part, br, num_segments=num_v,
                                   indices_are_sorted=True)

    timeit(current, (h, slot_src, valj, block_row),
           tag="  current degree block=16", edges=edges)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    # Reduce-variant shootout on the uniform graph, single bucket width.
    src_u = rng.integers(0, V, E).astype(np.int32)
    dst_u = np.sort(rng.integers(0, V, E).astype(np.int32))
    buckets, top, inv, slots = build_buckets(src_u, dst_u, V, 8)
    h = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.float32)
    rows0, cnt0, _ = buckets[-1]  # the biggest bucket
    rj, cj = jnp.asarray(rows0), jnp.asarray(cnt0)
    w = rows0.shape[1]
    eb = int(cnt0.sum())
    print(f"\nreduce-variant shootout on one bucket: {rows0.shape} "
          f"({eb/1e6:.1f}M edges)")

    def v_mask(c, h, s, cnt):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        mask = (jax.lax.iota(jnp.int32, w)[None, :]
                < cnt[:, None]).astype(msgs.dtype)
        return (msgs * mask[..., None]).sum(axis=1, dtype=jnp.float32)

    timeit(v_mask, (h, rj, cj), tag="mask-multiply + sum", edges=eb)

    def v_einsum(c, h, s, cnt):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        mask = (jax.lax.iota(jnp.int32, w)[None, :]
                < cnt[:, None]).astype(jnp.bfloat16)
        return jnp.einsum("rwf,rw->rf", msgs, mask,
                          preferred_element_type=jnp.float32)

    timeit(v_einsum, (h, rj, cj), tag="einsum (batched matvec, MXU)",
           edges=eb)

    def v_window(c, h, s, cnt):
        hb = (h * (1 + c * 1e-20)).astype(jnp.bfloat16)
        msgs = hb[s]
        mask = (jax.lax.iota(jnp.int32, w)[None, :]
                < cnt[:, None]).astype(msgs.dtype)
        prod = (msgs * mask[..., None]).reshape(-1, F)
        out = jax.lax.reduce_window(
            prod.astype(jnp.float32), 0.0, jax.lax.add,
            window_dimensions=(w, 1), window_strides=(w, 1),
            padding="VALID")
        return out

    timeit(v_window, (h, rj, cj), tag="reduce_window stride-w", edges=eb)

    run_graph("uniform Poisson(50)", src_u, dst_u, V, E)

    # Power-law graph: Zipf(1.6) degrees scaled to ~E edges.
    raw = rng.zipf(1.6, V).astype(np.int64)
    raw = np.minimum(raw, 200_000)
    deg = np.maximum((raw * (E / raw.sum())).astype(np.int64), 0)
    e_pl = int(deg.sum())
    dst_p = np.repeat(np.arange(V, dtype=np.int32), deg)
    src_p = rng.integers(0, V, e_pl).astype(np.int32)
    run_graph("power-law Zipf(1.6)", src_p, dst_p, V, e_pl)


if __name__ == "__main__":
    main()
