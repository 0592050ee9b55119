"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric: SpMM-aggregation edges/s/chip on a Reddit-shaped graph
(|V|=233k, ~11.6M directed edges, F=128 — the hidden dim of
run/reddit.config), which is the reference's north-star kernel (the Gather
phase that dominates its graph servers). The headline kernel is the
hybrid-ELL SpMM (ops/hyb_spmm.py: one slot row per vertex, DP-chosen
bucket widths, no big segment_sum) with bf16 gather tables (--agg-bf16):
the TPU gather is byte-rate-bound (tools/probe_roofline.py), so bf16
tables halve the wall; accumulation stays f32 and the mode is
precision-tested (tests/test_hyb_spmm.py).

fraction_of_gather_bound context (round-3 finding, tools/
probe_close_bound*.py): any XLA slot kernel = its gather bound + ONE
~660 GB/s streaming pass over the gathered bytes (XLA's fused
gather+reduce lowers 2x slower — it materializes an f32 convert of the
messages — and Mosaic offers no fast scattered-row gather), so ~0.83 is
the structural ceiling for the two-pass form; the hybrid kernel sits at
~0.80 with the remaining gap being its output permutation.

vs_baseline is measured against a scipy CSR SpMM on this host's CPU — the
in-repo analog of the reference's CPU backend (--MODE 2, OpenBLAS whole-
layer aggregation), since the reference publishes no absolute numbers
(BASELINE.md). Two honesty anchors accompany it in extras:
  - fraction_of_gather_bound: headline rate / the rate a pure gather of
    the same slot bytes achieves (the kernel's own measured ceiling —
    1.0 means aggregation is free beyond the irreducible gather);
  - f32 numbers for both kernels, so the bf16 win is auditable.

Epoch extras report full training epochs for the Reddit config (602-128-41)
GCN and GAT. Engines group epochs into one compiled lax.scan call, so a
warmup run compiles every group shape and a second run measures warm.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_graph(num_vertices: int, avg_degree: int, feature_dim: int,
                num_classes: int, seed: int = 0):
    """Random directed graph in CSC order, without the O(E log E) dedup of
    synthetic_graph (benchmark scale)."""
    from dorylus_tpu.graph.graph import Graph

    rng = np.random.default_rng(seed)
    e = num_vertices * avg_degree
    src = rng.integers(0, num_vertices, size=e, dtype=np.int64).astype(np.int32)
    dst = rng.integers(0, num_vertices, size=e, dtype=np.int64).astype(np.int32)
    g = Graph(
        num_vertices=num_vertices, src=src, dst=dst,
        features=rng.normal(0, 1, size=(num_vertices, feature_dim)).astype(np.float32),
        labels=rng.integers(0, num_classes, size=num_vertices).astype(np.int32),
        num_classes=num_classes,
    )
    return g.finalize()


def time_loop(fn, h, *rest, iters: int = 10):
    """Time `iters` chained applications inside ONE jit (lax.fori_loop) with
    a SCALAR carry/output. Two tunnel-backend hazards this avoids:
    block_until_ready returns early (so a host readback is the only honest
    sync), and large jit outputs are eagerly downloaded at ~150 MB/s (so
    the loop must reduce to a scalar on device)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(h, *rest):
        def body(i, c):
            out = fn(h + c * 1e-12, *rest)  # carry forces re-execution
            return out.ravel()[123].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(h, *rest))  # compile + warmup
    t0 = time.perf_counter()
    float(loop(h, *rest))
    return (time.perf_counter() - t0) / iters


def cpu_spmm_baseline(g, h: np.ndarray, iters: int = 3) -> float:
    """scipy CSR SpMM — the reference CPU backend's aggregation analog."""
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (g.edge_norm, (g.dst, g.src)), shape=(g.num_vertices, g.num_vertices))
    A @ h  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = A @ h
    dt = (time.perf_counter() - t0) / iters
    del out
    return g.num_edges / dt


def epoch_ms_warm(g, layers, cfg, epochs: int = 3) -> float:
    """Average warm epoch time: one run compiles every epoch-group shape,
    the second run measures."""
    from dorylus_tpu.engine.engine import Engine

    eng = Engine(g, layers, cfg)
    eng.run(epochs)
    rep = eng.run(epochs)
    return float(np.mean([e.time_ms for e in rep.epochs[-epochs:]]))


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: program shapes are paid once per machine,
    # ever (verified through the tunnel, tools/probe_compile_cache.py) —
    # most of this script's cold wall time is compiles.
    from dorylus_tpu.common.cache import enable_compile_cache
    enable_compile_cache()

    from dorylus_tpu.common.config import LayerConfig, TrainConfig
    from dorylus_tpu.ops.degree_spmm import DegreeSpMM, spmm_degree
    from dorylus_tpu.ops.hyb_spmm import HybSpMM, spmm_hyb
    from dorylus_tpu.ops.spmm import spmm_edgewise

    platform = jax.devices()[0].platform
    # Scale down when falling back to CPU (no TPU attached).
    on_tpu = platform not in ("cpu",)
    V = 232_965 if on_tpu else 23_296  # Reddit |V| (graph.bsnap)
    DEG = 50 if on_tpu else 20
    F_HID = 128
    iters = 10 if on_tpu else 3

    g = build_graph(V, DEG, 602, 41, seed=1)
    # Production preprocessing: ascending-degree renumbering makes the hyb
    # kernel's bucket layout the identity permutation (no output (V, F)
    # gather; cli.py --reorder degree-asc). The split keeps following
    # original indices via split_ids.
    from dorylus_tpu.graph.reorder import apply_order, degree_order
    g = apply_order(g, degree_order(g, ascending=True))
    E = g.num_edges

    # --- headline: SpMM aggregation at hidden width ---
    h = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, size=(V, F_HID)).astype(np.float32))
    val = jnp.asarray(g.edge_norm)

    results = {}
    for name, gd in (("bf16", jnp.bfloat16), ("f32", None)):
        # static_val: GCN norms are per-graph constants baked into the
        # plans (the production GCN path) — no runtime value gather.
        op = HybSpMM(np.asarray(g.src), np.asarray(g.dst), V, V,
                     gather_dtype=gd, feature_dim=F_HID,
                     static_val=np.asarray(g.edge_norm))

        n_iso = op.static[4]

        def agg(h, fwd, gd=gd, n_iso=n_iso):
            # Direct forward pass (the custom-vjp wrapper measures ~20%
            # slower fwd-only via fusion differences; epochs below use the
            # full differentiable path).
            return spmm_hyb(h, fwd, V, gather_dtype=gd, n_iso=n_iso)

        # Median-of-3 for the headline dtype: remote-tunnel scheduling
        # jitter moved single runs by ±2% across rounds.
        reps = 3 if name == "bf16" else 1
        dt = sorted(time_loop(agg, h, op.arrays["fwd"], iters=iters)
                    for _ in range(reps))[reps // 2]
        results[name] = dt
        if name == "bf16":
            # Dynamic per-edge values (the GAT-style workload) as an extra.
            def agg_dyn(h, arrs, val, op=op):
                return op.apply(arrs, h, val)

            results["bf16_dynamic"] = time_loop(agg_dyn, h, op.arrays, val,
                                                iters=iters)
            # Gather-bound ceiling: pure gathers of the same slot rows at
            # the same dtype — what the kernel would cost if the mask +
            # reduce + output permutation were free.
            fwd = op.arrays["fwd"]
            slot_arrays = [b["rows"] for b in fwd["buckets"]]
            if fwd["top"] is not None:
                slot_arrays.append(fwd["top"]["rows"])

            def gath(h, *rows):
                hb = h.astype(jnp.bfloat16)
                acc = hb[rows[0]].ravel()[3].astype(jnp.float32)
                for s in rows[1:]:
                    acc = acc + hb[s].ravel()[3].astype(jnp.float32)
                return jnp.reshape(acc, (1,))

            dt_g = time_loop(gath, h, *slot_arrays, iters=iters)
            gather_bound = E / dt_g
        del op

    # Previous rounds' kernel (degree-padded blocked) for continuity.
    dop = DegreeSpMM(np.asarray(g.src), np.asarray(g.dst), V, V, block=16,
                     gather_dtype=jnp.bfloat16, feature_dim=F_HID,
                     static_val=np.asarray(g.edge_norm))

    def agg_deg(h, fwd):
        return spmm_degree(h, fwd, V, None, gather_dtype=jnp.bfloat16)

    dt_deg = time_loop(agg_deg, h, dop.arrays["fwd"], iters=iters)
    del dop

    edges_per_s = E / results["bf16"]

    src = jnp.asarray(g.src)
    dst = jnp.asarray(g.dst)

    def agg_ew(h, src, dst, val):
        return spmm_edgewise(h, src, dst, val, V, sorted_dst=True)

    dt_ew = time_loop(agg_ew, h, src, dst, val, iters=iters)

    # --- extras: pair reuse at large V (the lever past the row-rate wall).
    # The headline graph is uniform-random (mines ~no pairs by
    # construction), so the algorithmic lever is benched on its target
    # workload: an overlap-heavy community graph at V=1.6M, where the
    # bf16 table (410 MB) sits in the slow >64MB gather regime and the
    # exact row-cut rewrite converts super-linearly
    # (benchmarks/results/reuse_r3.json). edges/s uses the ORIGINAL edge
    # count — the rewrite computes the identical operator.
    reuse_extras = {}
    if on_tpu:
        from dorylus_tpu.graph.graph import community_core_edges
        from dorylus_tpu.graph.reuse import mine_reuse
        from dorylus_tpu.ops.hyb_spmm import _hyb_pass

        rv, rdeg = 1_600_000, 15
        rsrc, rdst = community_core_edges(rv, rdeg, comm=400, core=60,
                                          p_core=0.85, seed=0)
        re_ = len(rsrc)
        rh = jnp.asarray(np.random.default_rng(3).normal(
            0, 0.3, size=(rv, F_HID)).astype(np.float32))
        op_p = HybSpMM(rsrc, rdst, rv, rv, feature_dim=F_HID,
                       gather_dtype=jnp.bfloat16)

        def plain_pass(h, arrs):
            return _hyb_pass(h, arrs, rv, "mask", None, jnp.bfloat16)

        dt_plain = time_loop(plain_pass, rh, op_p.arrays["fwd"], iters=iters)
        del op_p
        t0 = time.perf_counter()
        rplan = mine_reuse(rsrc, rdst, rv, min_uses=3, passes=2)
        mine_s = time.perf_counter() - t0
        op_r = HybSpMM(rplan.src, rplan.dst, rplan.table_size, rv,
                       feature_dim=F_HID, gather_dtype=jnp.bfloat16)
        lvls = tuple(jnp.asarray(l) for l in rplan.levels)

        def reuse_pass(h, arrs, *lvls):
            tbl = h
            for p in lvls:
                tbl = jnp.concatenate([tbl, tbl[p[:, 0]] + tbl[p[:, 1]]])
            return _hyb_pass(tbl, arrs, rv, "mask", None, jnp.bfloat16)

        dt_reuse = time_loop(reuse_pass, rh, op_r.arrays["fwd"], *lvls,
                             iters=iters)
        del op_r
        reuse_extras = {
            "reuse_largev_V": rv,
            "reuse_largev_E": re_,
            "reuse_largev_plain_edges_per_s": round(re_ / dt_plain, 1),
            "reuse_largev_edges_per_s": round(re_ / dt_reuse, 1),
            "reuse_largev_speedup": round(dt_plain / dt_reuse, 3),
            "reuse_row_cut": round(rplan.stats["row_reduction"], 3),
            "reuse_mine_s": round(mine_s, 1),
        }
        # Reddit-scale capped reuse through FULL training epochs: the
        # engine's auto pair budget keeps the table at the gather cliff,
        # where the rewrite WINS 1.20-1.27x (reuse_budget_r4.json; the
        # uncapped rewrite reproduces the r3 0.50x loss). Community
        # graph = the real-social-graph overlap shape.
        rv2 = V
        rsrc2, rdst2 = community_core_edges(rv2, DEG, comm=400, core=60,
                                            p_core=0.85, seed=0)
        from dorylus_tpu.graph.graph import Graph
        rng2 = np.random.default_rng(4)
        rg2 = Graph(num_vertices=rv2, src=rsrc2, dst=rdst2,
                    features=rng2.normal(0, 0.3, size=(rv2, 602)).astype(
                        np.float32),
                    labels=((np.arange(rv2) * 41) // rv2).astype(np.int32),
                    num_classes=41).finalize()
        ep_off = epoch_ms_warm(rg2, LayerConfig([602, 128, 41]), TrainConfig(
            epochs=3, eval_every=0, kernel="hyb", agg_dtype="bfloat16",
            reuse="off"))
        ep_reuse = epoch_ms_warm(rg2, LayerConfig([602, 128, 41]),
                                 TrainConfig(epochs=3, eval_every=0,
                                             kernel="hyb",
                                             agg_dtype="bfloat16",
                                             reuse="pairs"))
        reuse_extras.update({
            "reuse_reddit_community_epoch_off_ms": round(ep_off, 2),
            "reuse_reddit_community_epoch_ms": round(ep_reuse, 2),
            "reuse_reddit_community_speedup": round(ep_off / ep_reuse, 3),
        })

    # --- baseline: host-CPU scipy CSR SpMM (reference CPU-mode analog) ---
    cpu_eps = cpu_spmm_baseline(g, np.asarray(h))

    # --- extras: full training epochs, Reddit config 602-128-41 ---
    # kernel="hyb" is what auto resolves to at this scale (config.py).
    layers = LayerConfig([602, 128, 41])
    epoch_gcn = epoch_ms_warm(g, layers, TrainConfig(
        epochs=3, eval_every=0, kernel="hyb", reuse="off"))
    epoch_gcn_bf16 = epoch_ms_warm(g, layers, TrainConfig(
        epochs=3, eval_every=0, kernel="hyb", agg_dtype="bfloat16",
        reuse="off"))
    # GAT (the reference's run-reddit-gat benchmark; a slot-grid kernel —
    # the edgewise VJP's chunk-scan residuals exceed HBM in TPU compile at
    # this scale, see config.py resolve_kernel).
    epoch_gat = epoch_ms_warm(g, layers, TrainConfig(
        model="gat", epochs=3, eval_every=0, kernel="hyb",
        learning_rate=0.005, reuse="off"))
    epoch_gat_bf16 = epoch_ms_warm(g, layers, TrainConfig(
        model="gat", epochs=3, eval_every=0, kernel="hyb",
        learning_rate=0.005, agg_dtype="bfloat16", reuse="off"))

    print(json.dumps({
        "metric": "spmm_aggregation_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / cpu_eps, 3),
        "extras": {
            "platform": platform,
            "num_vertices": V,
            "num_edges": E,
            "feature_dim": F_HID,
            "kernel": "hyb+bf16gather+staticvals+degsort",
            "spmm_ms": round(results["bf16"] * 1e3, 3),
            "spmm_dynamic_vals_ms": round(results["bf16_dynamic"] * 1e3, 3),
            "spmm_f32_ms": round(results["f32"] * 1e3, 3),
            "spmm_f32_edges_per_s": round(E / results["f32"], 1),
            "spmm_degree_kernel_ms": round(dt_deg * 1e3, 3),
            "spmm_degree_kernel_edges_per_s": round(E / dt_deg, 1),
            "fraction_of_gather_bound": round(edges_per_s / gather_bound, 3),
            "gather_bound_edges_per_s": round(gather_bound, 1),
            "edgewise_spmm_ms": round(dt_ew * 1e3, 3),
            "edgewise_edges_per_s": round(E / dt_ew, 1),
            "cpu_scipy_edges_per_s": round(cpu_eps, 1),
            "gcn_reddit_config_epoch_ms": round(epoch_gcn, 2),
            "gcn_reddit_config_epoch_bf16_ms": round(epoch_gcn_bf16, 2),
            "gat_reddit_config_epoch_ms": round(epoch_gat, 2),
            "gat_reddit_config_epoch_bf16_ms": round(epoch_gat_bf16, 2),
            **reuse_extras,
        },
    }))


if __name__ == "__main__":
    main()
