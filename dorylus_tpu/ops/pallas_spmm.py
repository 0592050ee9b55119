"""Pallas TPU SpMM: transposed, segmented chunk-chain kernel.

Hardware facts that shape the design (probed on TPU v5e, jax 0.9 Mosaic):
  - tpu.dynamic_gather only gathers within ONE vreg along the gather dim
    (8 sublanes / 128 lanes). Arbitrary-row VMEM gather and any scatter
    are unavailable inside kernels.
  - XLA's scatter/gather lowerings run at 12-67 M edges/s (35-60 GB/s) -
    far below the ~800 GB/s HBM streaming rate
    (measured in tools/microbench_spmm.py).

Design: operate on TRANSPOSED features h_T (F, V) so the vertex axis lies
on lanes. Edges are sorted by (dst_block, src_window, dst) and cut into
chunks of 128 edge slots, each chunk reading one 128-column source window:

  per chunk:  gather (F,128) window columns by src lane index - a single
              lane-vreg dynamic_gather;  multiply by edge values;
              inclusive cumsum along lanes (7 masked rolls);
              per-dst-run partial = cum[run_end] - cum[run_start-1],
              placed at the run's last lane;  write the (F,128) partials
              block linearly (pure streaming, no revisit, no scatter).

Chunk-runs are re-reduced by the SAME kernel at level 1 (windows now index
level-0 partial positions), and leftovers meet a final sorted segment-sum.
To bound memory, chunks are processed in SEGMENTS of `seg_chunks` under
lax.map: each segment's level-0 partials (~0.5-1 GB) are consumed by its
own level-1 pass before the next segment runs.

Compression - and therefore the win over XLA segment_sum - comes from
graph locality: clustered/METIS-ordered graphs collapse most runs inside
chunks. Uniform-random graphs do not compress; use the XLA path for those
(ops/spmm.py). Chunks sharing a source window are consecutive, so Pallas
skips refetching the window - locality pays twice.

Plan arrays must flow through jit ARGUMENTS (carried in the batch pytree):
closure ndarrays are embedded into the compiled program as constants and
overflow the compile pipeline.

The VJP reuses the machinery: dL/dh is the same SpMM over the transposed
graph; dL/dval (GAT attention gradients) is an edge-chunked XLA SDDMM.
Replaces the reference's per-vertex CSC aggregation loop
(src/graph-server/engine/ops/gcn_ops.cpp:130-191) and its hand-written
backward aggregate.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ---------------- host-side plan construction ----------------


@dataclass
class LevelArrays:
    window: np.ndarray  # (..., n_chunks) int32
    src_local: np.ndarray  # (..., n_chunks, 128) int32
    run_start: np.ndarray  # (..., n_chunks, 128) int32
    is_last: np.ndarray  # (..., n_chunks, 128) float32


def _build_level(src_pos: np.ndarray, dst: np.ndarray,
                 dst_block: int = 8192, t: int = 1024):
    """Sort + chunk edges. Returns (LevelArrays, edge_slot, run_pos,
    run_dst, run_chunk); runs are maximal same-dst spans within a chunk."""
    from dorylus_tpu import native

    e = len(src_pos)
    src_pos = np.asarray(src_pos, np.int64)
    dst = np.asarray(dst, np.int64)
    win = src_pos // t
    dblk = dst // dst_block
    # Stable two-pass sort == lexsort((dst, win, dblk)): counting sort by
    # dst, then a stable composite (dblk, win) key sort — both native-
    # accelerated (numpy lexsort dominates plan build otherwise).
    order1 = native.sort_by_dst(dst.astype(np.int32), int(dst.max()) + 1 if e else 1)
    n_win = int(win.max()) + 1 if e else 1
    key = (dblk[order1] * n_win + win[order1]).astype(np.uint64)
    order = order1[native.sort_by_key64(key)]
    s_o, d_o, w_o = src_pos[order], dst[order], win[order]

    new_bucket = np.r_[True, (w_o[1:] != w_o[:-1]) |
                       (d_o[1:] // dst_block != d_o[:-1] // dst_block)]
    pos_in_bucket = np.arange(e) - np.maximum.accumulate(
        np.where(new_bucket, np.arange(e), 0))
    bucket_id = np.cumsum(new_bucket) - 1
    chunk_key = bucket_id * (1 << 24) + pos_in_bucket // t
    new_chunk = np.r_[True, chunk_key[1:] != chunk_key[:-1]]
    chunk_id = np.cumsum(new_chunk) - 1
    lane = pos_in_bucket % t
    n_chunks = int(chunk_id[-1]) + 1 if e else 1

    window = np.zeros(n_chunks, np.int32)
    src_local = np.zeros((n_chunks, t), np.int32)
    run_start = np.zeros((n_chunks, t), np.int32)
    is_last = np.zeros((n_chunks, t), np.float32)

    window[chunk_id] = w_o.astype(np.int32)
    src_local[chunk_id, lane] = (s_o % t).astype(np.int32)

    new_run = new_chunk | np.r_[True, d_o[1:] != d_o[:-1]]
    run_id = np.cumsum(new_run) - 1
    run_first = np.flatnonzero(new_run)
    run_last = np.r_[run_first[1:] - 1, e - 1] if e else np.empty(0, np.int64)

    run_start[chunk_id, lane] = lane[run_first[run_id]].astype(np.int32)
    is_last[chunk_id[run_last], lane[run_last]] = 1.0

    edge_slot = np.empty(e, np.int64)
    edge_slot[order] = chunk_id * t + lane

    run_pos = chunk_id[run_last] * t + lane[run_last]
    run_dst = d_o[run_last]
    run_chunk = chunk_id[run_last]
    lv = LevelArrays(window=window, src_local=src_local,
                     run_start=run_start, is_last=is_last)
    return lv, edge_slot, run_pos, run_dst, run_chunk


def _pad_level(lv: LevelArrays, n: int) -> LevelArrays:
    k = n - lv.window.shape[0]
    assert k >= 0
    return LevelArrays(
        window=np.pad(lv.window, (0, k)),
        src_local=np.pad(lv.src_local, ((0, k), (0, 0))),
        run_start=np.pad(lv.run_start, ((0, k), (0, 0))),
        is_last=np.pad(lv.is_last, ((0, k), (0, 0))),
    )


@dataclass
class Stage:
    """One reduction stage: a segmented kernel pass + dst-sorted extraction."""

    n_seg: int
    seg_chunks: int
    t: int  # edges per chunk (lanes per metadata row; multiple of 128)
    runs_per_seg: int  # uniform (padded) extracted runs per segment
    n_src: int  # padded width of this stage's input table
    level: LevelArrays  # (n_seg, seg_chunks, ...)
    run_pos: np.ndarray  # (n_seg, runs_per_seg) int32, local to segment partials
    run_mask: np.ndarray  # (n_seg, runs_per_seg) float32 (0 on padding)


@dataclass
class ChainPlan:
    stages: List[Stage]
    edge_slot: np.ndarray  # (E,) int64 — stage-0 slot of each input edge
    final_dst: np.ndarray  # (R_last,) int32; padding routes to num_out
    num_edges: int
    num_in: int
    num_out: int

    @property
    def compression(self) -> float:
        return len(self.final_dst) / max(1, self.num_edges)


class _NeedBiggerDims(Exception):
    """Raised when forced stage dims are too small; carries the needed
    (n_stages, [(n_seg, sc, rps), ...])."""

    def __init__(self, dims):
        self.dims = dims


def build_chain_plan(src: np.ndarray, dst: np.ndarray, num_in: int,
                     num_out: int, seg_chunks: int = 1024,
                     tile: int = 1024, max_stages: int = 4,
                     stop_runs: int | None = None,
                     force_dims=None) -> ChainPlan:
    """Recursive plan: stage 0 consumes real edges; later stages consume the
    previous stage's extracted runs (identity-ordered positions, so their
    windows barely fragment). Extraction is dst-sorted per segment and
    segments cover disjoint dst ranges (dst-block-major chunk order), so
    each stage's input is nearly dst-sorted => geometric compression even
    for uniform-random graphs.

    force_dims: list of (n_seg, seg_chunks, runs_per_seg) fixing every
    stage's shapes (SPMD uniformity across shards); raises _NeedBiggerDims
    when insufficient. With force_dims the plan has exactly len(force_dims)
    stages (extra stages keep reducing; harmless)."""
    e = len(src)
    stop_runs = stop_runs if stop_runs is not None else max(num_out // 2, 1 << 15)
    stages: List[Stage] = []
    cur_src = np.asarray(src, np.int64)
    cur_dst = np.asarray(dst, np.int64)
    n_src = max(LANES, -(-num_in // LANES) * LANES)
    edge_slot = None
    n_stages = len(force_dims) if force_dims else max_stages

    for depth in range(n_stages):
        lv, slot, run_pos, run_dst, run_chunk = _build_level(
            cur_src, cur_dst, t=tile)
        if depth == 0:
            edge_slot = slot
        n_chunks = lv.window.shape[0]
        if force_dims is not None:
            f_nseg, f_sc, f_rps = force_dims[depth]
            if n_chunks > f_nseg * f_sc:
                raise _NeedBiggerDims(_needed_dims(
                    src, dst, num_in, num_out, seg_chunks, tile, n_stages))
            n_seg, sc = f_nseg, f_sc
        else:
            n_seg = max(1, -(-n_chunks // seg_chunks))
            sc = seg_chunks if n_chunks > seg_chunks else max(8, -(-n_chunks // 8) * 8)
            n_seg = max(1, -(-n_chunks // sc))
        lv = _pad_level(lv, n_seg * sc)

        seg_of_run = run_chunk // sc
        counts = np.bincount(seg_of_run, minlength=n_seg)
        runs_per_seg = max(8, -(-int(counts.max()) // 8) * 8)
        if force_dims is not None:
            if runs_per_seg > force_dims[depth][2]:
                raise _NeedBiggerDims(_needed_dims(
                    src, dst, num_in, num_out, seg_chunks, tile, n_stages))
            runs_per_seg = force_dims[depth][2]
        rp = np.zeros((n_seg, runs_per_seg), np.int32)
        rm = np.zeros((n_seg, runs_per_seg), np.float32)
        nxt_dst = np.full(n_seg * runs_per_seg, num_out, np.int64)
        for s_i in range(n_seg):
            sel = np.flatnonzero(seg_of_run == s_i)
            order2 = np.argsort(run_dst[sel], kind="stable")
            sel = sel[order2]
            k = len(sel)
            rp[s_i, :k] = (run_pos[sel] - s_i * sc * tile).astype(np.int32)
            rm[s_i, :k] = 1.0
            nxt_dst[s_i * runs_per_seg: s_i * runs_per_seg + k] = run_dst[sel]

        stages.append(Stage(
            n_seg=n_seg, seg_chunks=sc, t=tile, runs_per_seg=runs_per_seg,
            n_src=n_src,
            level=LevelArrays(
                window=lv.window.reshape(n_seg, sc),
                src_local=lv.src_local.reshape(n_seg, sc, tile),
                run_start=lv.run_start.reshape(n_seg, sc, tile),
                is_last=lv.is_last.reshape(n_seg, sc, tile),
            ),
            run_pos=rp, run_mask=rm,
        ))
        r = n_seg * runs_per_seg
        # Even a non-compressing stage makes progress: its dst-sorted
        # extraction means the NEXT stage gets identity-window input and
        # collapses runs (uniform-random graphs compress only at stage 2).
        if force_dims is None and r <= stop_runs:
            cur_dst = nxt_dst
            break
        cur_src = np.arange(r, dtype=np.int64)
        cur_dst = nxt_dst
        n_src = max(tile, -(-r // tile) * tile)

    return ChainPlan(stages=stages, edge_slot=edge_slot,
                     final_dst=cur_dst.astype(np.int32), num_edges=e,
                     num_in=num_in, num_out=num_out)


def _needed_dims(src, dst, num_in, num_out, seg_chunks, tile, n_stages):
    """Dims an unforced build of exactly n_stages would use."""
    plan = build_chain_plan(src, dst, num_in, num_out, seg_chunks, tile,
                            max_stages=n_stages, stop_runs=0)
    dims = [(st.n_seg, st.seg_chunks, st.runs_per_seg) for st in plan.stages]
    while len(dims) < n_stages:
        dims.append(dims[-1])
    return dims


# ---------------- kernel ----------------


def _multi_pass_gather(src2d, idx, f, t, k):
    """Gather src2d (f, t) at lane indices idx (t,) in [0, t): k passes of
    single-vreg lane gathers + selects (Mosaic gathers within one 128-lane
    vreg only)."""
    parts = []
    for eb in range(k):
        ids = idx[eb * LANES:(eb + 1) * LANES]
        idx_f = jnp.broadcast_to(ids[None, :], (f, LANES))
        acc = jnp.zeros((f, LANES), jnp.float32)
        for p in range(k):
            # Cast before gathering: Mosaic requires gather data and index
            # bitwidths to match (bf16 tables otherwise fail).
            sp = src2d[:, p * LANES:(p + 1) * LANES].astype(jnp.float32)
            local = jnp.clip(idx_f - p * LANES, 0, LANES - 1)
            g = jnp.take_along_axis(sp, local, axis=1)
            acc = jnp.where(
                (idx_f >= p * LANES) & (idx_f < (p + 1) * LANES), g, acc)
        parts.append(acc)
    return jnp.concatenate(parts, axis=1)  # (f, t)


def _chain_kernel(w_ref, sl_ref, rs_ref, il_ref, val_ref, h_ref, out_ref,
                  *, f: int, t: int):
    c = pl.program_id(0)
    r = c % 8
    k = t // LANES

    sl = sl_ref[r, :]  # (t,) lane index within the source window
    if k == 1:
        idx = jnp.broadcast_to(sl[None, :], (f, t))
        g = jnp.take_along_axis(h_ref[:].astype(jnp.float32), idx, axis=1)
    else:
        g = _multi_pass_gather(h_ref[:], sl, f, t, k)
    # Accumulate in f32 even when the table is bf16 (inter-stage compression).
    msgs = g.astype(jnp.float32) * val_ref[r, :][None, :].astype(jnp.float32)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (f, t), 1)
    x = msgs
    s = 1
    while s < t:
        x = x + jnp.where(lanes >= s, pltpu.roll(x, s, 1), 0.0)
        s *= 2

    rs = rs_ref[r, :]
    if k == 1:
        rs2 = jnp.broadcast_to(rs[None, :], (f, t))
        prev = jnp.take_along_axis(x, jnp.maximum(rs2 - 1, 0), axis=1)
        seg = x - jnp.where(rs2 > 0, prev, 0.0)
    else:
        prev = _multi_pass_gather(x, jnp.maximum(rs - 1, 0), f, t, k)
        rs2 = jnp.broadcast_to(rs[None, :], (f, t))
        seg = x - jnp.where(rs2 > 0, prev, 0.0)
    out_ref[:] = seg * il_ref[r, :][None, :]


def _run_level(h_t, window, src_local, run_start, is_last, val_2d, f,
               t, interpret):
    """h_t: (F, n_src). Metadata: (n_chunks[, t]). -> (F, n_chunks*t)."""
    n_chunks = window.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # window
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((8, t), lambda c, w: (c // 8, 0)),  # src_local
            pl.BlockSpec((8, t), lambda c, w: (c // 8, 0)),  # run_start
            pl.BlockSpec((8, t), lambda c, w: (c // 8, 0)),  # is_last
            pl.BlockSpec((8, t), lambda c, w: (c // 8, 0)),  # val
            pl.BlockSpec((f, t), lambda c, w: (0, w[c])),  # h window
        ],
        out_specs=pl.BlockSpec((f, t), lambda c, w: (0, c)),
    )
    return pl.pallas_call(
        functools.partial(_chain_kernel, f=f, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, n_chunks * t), jnp.float32),
        interpret=interpret,
    )(window, src_local, run_start, is_last, val_2d, h_t)


# ---------------- functional apply ----------------


@dataclass(frozen=True)
class StageStatic:
    n_seg: int
    seg_chunks: int
    t: int
    runs_per_seg: int
    n_src: int


@dataclass(frozen=True)
class ChainStatic:
    stages: tuple  # of StageStatic
    num_out: int


def _plan_static(plan: ChainPlan) -> ChainStatic:
    return ChainStatic(
        stages=tuple(StageStatic(st.n_seg, st.seg_chunks, st.t,
                                 st.runs_per_seg, st.n_src)
                     for st in plan.stages),
        num_out=plan.num_out,
    )


def _plan_arrays(plan: ChainPlan) -> dict:
    asj = jnp.asarray
    return {
        "stages": [
            {"window": asj(st.level.window),
             "src_local": asj(st.level.src_local),
             "run_start": asj(st.level.run_start),
             "is_last": asj(st.level.is_last),
             "run_pos": asj(st.run_pos),
             "run_mask": asj(st.run_mask)}
            for st in plan.stages
        ],
        "final_dst": asj(plan.final_dst),
        "edge_slot": asj(plan.edge_slot.astype(np.int32)),
        # Inverse slot map: slot -> edge index (num_edges = padding slot).
        # Turning the per-call val scatter into a gather is a ~10x win
        # (XLA scatter of 11.6M elements measured at ~1.15 s on v5e).
        "slot_to_edge": asj(_invert_edge_slot(
            plan.edge_slot, plan.stages[0]).astype(np.int32)),
    }


def _invert_edge_slot(edge_slot: np.ndarray, st0: Stage) -> np.ndarray:
    n_slots = st0.n_seg * st0.seg_chunks * st0.t
    inv = np.full(n_slots, len(edge_slot), np.int64)
    inv[edge_slot] = np.arange(len(edge_slot))
    return inv


def _apply_chain(static: ChainStatic, arrs: dict, h, val, interpret,
                 interstage=None):
    f_real = h.shape[1]
    f = max(8, -(-f_real // 8) * 8)
    st0 = static.stages[0]
    table = jnp.pad(h.T, ((0, f - f_real), (0, st0.n_src - h.shape[0])))

    vals = None
    for si, (st, sa) in enumerate(zip(static.stages, arrs["stages"])):
        if si == 0:
            val_ext = jnp.concatenate(
                [val.astype(h.dtype), jnp.zeros((1,), h.dtype)])
            val_2d = val_ext[arrs["slot_to_edge"]] \
                .reshape(st.n_seg, st.seg_chunks, st.t)
            xs = (sa["window"], sa["src_local"], sa["run_start"],
                  sa["is_last"], val_2d, sa["run_pos"], sa["run_mask"])
        else:
            r_prev = vals.shape[0] * vals.shape[1]
            table = vals.reshape(r_prev, f).T
            if table.shape[1] < st.n_src:
                table = jnp.pad(table, ((0, 0), (0, st.n_src - table.shape[1])))
            # Unit weights are built per segment inside seg_fn — an R-sized
            # ones array would cost gigabytes at scale.
            xs = (sa["window"], sa["src_local"], sa["run_start"],
                  sa["is_last"], None, sa["run_pos"], sa["run_mask"])

        mid = si + 1 < len(static.stages) and interstage is not None
        out_dt = jnp.dtype(interstage) if mid else jnp.float32

        def seg_fn(seg, table=table, t=st.t, sc=st.seg_chunks, out_dt=out_dt):
            lw, sl, rs, il, v2d, rpos, rmask = seg
            if v2d is None:
                v2d = jnp.ones((sc, t), jnp.float32)
            p = _run_level(table, lw, sl, rs, il, v2d, f, t, interpret)
            return (p.T[rpos] * rmask[:, None]).astype(out_dt)

        vals = jax.lax.map(seg_fn, xs)  # (n_seg, runs_per_seg, F)

    out_t = jax.ops.segment_sum(
        vals.reshape(-1, f), arrs["final_dst"],
        num_segments=static.num_out + 1)
    return out_t[: static.num_out, :f_real]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_spmm_apply(static, arrs, h, val):
    """static: (fwd ChainStatic, bwd ChainStatic, num_in, interpret,
    interstage_dtype). arrs: {"fwd", "bwd", "src", "dst"}."""
    fwd_static, _, _, interpret, interstage = static
    return _apply_chain(fwd_static, arrs["fwd"], h, val, interpret, interstage)


def _apply_fwd(static, arrs, h, val):
    return pallas_spmm_apply(static, arrs, h, val), (arrs, h, val)


def _apply_bwd(static, res, gout):
    arrs, h, val = res
    _, bwd_static, num_in, interpret, interstage = static
    dh = _apply_chain(bwd_static, arrs["bwd"], gout, val, interpret,
                      interstage)[:h.shape[0]]
    dval = _sddmm_chunked(h, gout, arrs["src"], arrs["dst"]).astype(val.dtype)
    d_arrs = jax.tree.map(
        lambda x: jnp.zeros_like(x) if jnp.issubdtype(x.dtype, jnp.floating)
        else None, arrs)
    return d_arrs, dh, dval


pallas_spmm_apply.defvjp(_apply_fwd, _apply_bwd)


class PallasSpMM:
    """out[v] = sum_{e: dst[e]=v} val[e] * h[src[e]], differentiable in h
    and val, sparsity pattern bound at construction.

    IMPORTANT: inside jit, pass `op.arrays` through the function arguments
    (e.g. in the batch pytree) and call `op.apply(arrays, h, val)`; calling
    `op(h, val)` from a traced function embeds the plan arrays as
    compiled-in constants and overflows the compile pipeline.
    """

    def __init__(self, src, dst, num_in, num_out, interpret=None,
                 seg_chunks: int = 1024, tile: int = 1024,
                 interstage_dtype=None):
        if interpret is None:
            # Mosaic kernels only compile for TPU; interpret elsewhere.
            interpret = jax.default_backend() in ("cpu",)
        if interstage_dtype is None:
            # Large graphs: bf16 inter-stage handoff halves the multi-GB
            # intermediate run buffers (kernels still accumulate in f32).
            interstage_dtype = "bfloat16" if len(src) > 4_000_000 else None
        self.interstage_dtype = interstage_dtype
        self.interpret = interpret
        self.num_in = num_in
        self.num_out = num_out
        self.num_edges = len(src)
        self.fwd = build_chain_plan(src, dst, num_in, num_out, seg_chunks,
                                    tile=tile)
        self.bwd = build_chain_plan(dst, src, num_out, num_in, seg_chunks,
                                    tile=tile)
        self.arrays = {
            "fwd": _plan_arrays(self.fwd),
            "bwd": _plan_arrays(self.bwd),
            "src": jnp.asarray(np.asarray(src, np.int32)),
            "dst": jnp.asarray(np.asarray(dst, np.int32)),
        }
        self.static = (_plan_static(self.fwd), _plan_static(self.bwd),
                       num_in, interpret, interstage_dtype)

    def apply(self, arrays, h, val):
        return pallas_spmm_apply(self.static, arrays, h, val)

    def __call__(self, h, val):
        return pallas_spmm_apply(self.static, self.arrays, h, val)


def _sddmm_chunked(h, gout, src, dst, chunk: int = 1 << 20):
    """Edge-chunked SDDMM g[e] = <h[src e], gout[dst e]> without
    materializing (E, F)."""
    e = src.shape[0]
    if e <= chunk:
        return jnp.sum(h[src] * gout[dst], axis=1)
    n_chunks = -(-e // chunk)
    pad = n_chunks * chunk - e
    sp = jnp.concatenate([src, jnp.zeros(pad, src.dtype)])
    dp = jnp.concatenate([dst, jnp.zeros(pad, dst.dtype)])

    def body(_, ch):
        s, d = ch
        return None, jnp.sum(h[s] * gout[d], axis=1)

    _, outs = jax.lax.scan(body, None,
                           (sp.reshape(n_chunks, -1), dp.reshape(n_chunks, -1)))
    return outs.reshape(-1)[:e]
