"""Sharded pair-reuse SpMM: per-shard HAG rewrites under one SPMD program.

Round-3 verdict: the pair-reuse lever (graph/reuse.py) only wins at
>1M-vertex scale — exactly where real graphs are sharded — yet the op was
single-shard only. This module closes that gap: each vertex shard mines
pairs over ITS OWN edge set (src indexes the local+ghost feature table,
so no cross-shard build gathers are ever needed — a pair row combines two
rows that are already materialized on this shard after the halo
exchange), and the rewritten per-shard edge lists are laid out as uniform
hyb plans exactly like ops/hyb_sharded.py:

  1. mine per shard on the REAL edges (pads excluded), fwd over
     (src -> dst) and bwd over the transpose;
  2. pad each mining level's pair list to the cross-shard max with dead
     (0, 0) pairs — they append table rows no edge references;
  3. pad rewritten edge lists to the cross-shard max with dead edges
     (dst = num_out - 1, tail-positioned — the prefix-liveness invariant
     of the mask-mode hyb pass holds because pads stable-sort after the
     real edges of that vertex);
  4. ONE pooled width-DP + _uniform_plans (ops/hyb_sharded.py) over the
     rewritten lists.

GCN rides the rank-1 norm factorization f(src)·f(dst) with
f = sqrt(self_norm) (reference dataloader.cpp:153-185): the table is
pre-scaled by a per-shard (vp + n*max_h,) "f_in" vector (ghost entries
carry the REMOTE vertex's f, assembled from the peers' send lists) and
the output post-scaled by "f_out" — both static, riding `.arrays`. GAT's
dst-only attention factors out of each destination's sum unchanged
(funcs/gat/ops/forward_ops.cpp:109-141).

The rewrite computes exactly the original operator, so the backward is
the transposed operator, served by the transposed edges' own rewrite
(ops/reuse_spmm.py reuse_unit_pass custom VJP — shared with the
single-shard op).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dorylus_tpu.graph.partition import ShardedGraph
from dorylus_tpu.graph.reuse import mine_reuse
from dorylus_tpu.ops.hyb_sharded import _uniform_plans
from dorylus_tpu.ops.hyb_spmm import (_LAMBDA_SLOTS, _choose_widths,
                                      build_hyb_plan)
from dorylus_tpu.ops.reuse_spmm import reuse_unit_pass


def _pad_edges(src: np.ndarray, dst: np.ndarray, ep: int,
               num_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Tail-pad a dst-ascending rewritten edge list with dead edges
    aimed at the last output row (keeps dst ascending; liveness is
    edge-id < nreal, a per-row prefix because pads follow the real
    edges of row num_out-1)."""
    pad = ep - len(src)
    s = np.concatenate([src, np.zeros(pad, np.int32)]).astype(np.int32)
    d = np.concatenate([dst,
                        np.full(pad, num_out - 1, np.int32)]).astype(np.int32)
    return s, d


def _padded_level_sizes(levels_per_shard: list[list[np.ndarray]]
                        ) -> list[int]:
    """Cross-shard max pair count per mining level."""
    n_lvl = max((len(ls) for ls in levels_per_shard), default=0)
    return [max(len(ls[k]) if k < len(ls) else 0
                for ls in levels_per_shard) for k in range(n_lvl)]


def _remap_pair_ids(levels: list[np.ndarray], src: np.ndarray, base: int,
                    pks: list[int]) -> tuple[list[np.ndarray], np.ndarray]:
    """Shift this shard's pair ids to the cross-shard-PADDED table layout.

    mine_reuse assigns level-(k+1) ids starting at base + sum(own level
    sizes <= k), but the padded build table places level k+1's real rows
    at base + sum(PADDED sizes <= k) — without this remap any shard whose
    earlier level mined fewer pairs than the cross-shard max would gather
    the wrong rows on every later level (and on rewritten edges that
    reference them)."""
    own = [len(l) for l in levels]
    cum_own = np.cumsum([0] + own)
    cum_pad = np.cumsum([0] + list(pks[:len(own)]))
    delta = cum_pad - cum_own  # shift for ids born at each level

    def remap(a: np.ndarray) -> np.ndarray:
        a = np.asarray(a, np.int64)
        isp = a >= base
        if not isp.any():
            return a.astype(np.int32)
        # birth level of each pair id: position in the own-size prefix sums
        lvl = np.searchsorted(cum_own[1:], a[isp] - base, side="right")
        out = a.copy()
        out[isp] = a[isp] + delta[lvl]
        return out.astype(np.int32)

    new_levels = [remap(l.reshape(-1)).reshape(l.shape).astype(np.int32)
                  if l.size else l for l in levels]
    return new_levels, remap(src)


def _pad_levels(levels_per_shard: list[list[np.ndarray]],
                pks: list[int]) -> list[np.ndarray]:
    """Stack per-shard mining levels: pad each level to the cross-shard
    max pair count with dead (0, 0) pairs and missing trailing levels
    with all-dead levels, so every shard builds the same-SHAPED table.
    Callers must have remapped ids to the padded layout first."""
    out = []
    for k, pk in enumerate(pks):
        stacked = []
        for ls in levels_per_shard:
            lvl = (ls[k] if k < len(ls)
                   else np.zeros((0, 2), np.int32))
            stacked.append(np.pad(lvl, ((0, pk - len(lvl)), (0, 0))))
        out.append(np.stack(stacked).astype(np.int32))
    return out


class ShardedReuseSpMM:
    """Per-shard pair rewrites with uniform plan shapes; same protocol as
    ShardedHybSpMM (arrays stacked on a leading shard axis, squeezed by
    shard_map). apply_static (GCN rank-1) / apply_dst / apply_unit."""

    def __init__(self, sharded: ShardedGraph, max_width: int = 512,
                 gather_dtype=None, feature_dim: int = 128,
                 rank1_factor=None, min_uses: int = 3, passes: int = 1,
                 max_pairs: int = 0, lam_slots: int = _LAMBDA_SLOTS):
        n = sharded.n_shards
        vp = sharded.vp
        table = vp + n * sharded.max_h
        self.num_in, self.num_out = table, vp
        self.has_static_vals = rank1_factor is not None

        fwd_mined, bwd_mined = [], []
        for s in sharded.shards:
            ne = s.num_edges
            src = np.asarray(s.src[:ne], np.int32)
            dst = np.asarray(s.dst[:ne], np.int32)
            fwd_mined.append(mine_reuse(src, dst, table, min_uses=min_uses,
                                        passes=passes, max_pairs=max_pairs))
            bwd_mined.append(mine_reuse(dst, src, vp, min_uses=min_uses,
                                        passes=passes, max_pairs=max_pairs))
        self.plan_fwd, self.plan_bwd = fwd_mined, bwd_mined
        # Remap pair ids to the cross-shard-padded table layout (see
        # _remap_pair_ids) — required whenever shards mine unequal pair
        # counts, i.e. always.
        pks_fwd = _padded_level_sizes([m.levels for m in fwd_mined])
        pks_bwd = _padded_level_sizes([m.levels for m in bwd_mined])
        lv_fwd, src_fwd, lv_bwd, src_bwd = [], [], [], []
        for mf, mb in zip(fwd_mined, bwd_mined):
            lv, s2 = _remap_pair_ids(mf.levels, mf.src, table, pks_fwd)
            lv_fwd.append(lv)
            src_fwd.append(s2)
            lv, s2 = _remap_pair_ids(mb.levels, mb.src, vp, pks_bwd)
            lv_bwd.append(lv)
            src_bwd.append(s2)

        def build_dir(mined, srcs, num_out_dir):
            ep2 = max(128, max(len(s_) for s_ in srcs))
            # Pad first, THEN pool the width DP over the PADDED degree
            # spectra (matches ops/hyb_sharded.py, whose shards arrive
            # pre-padded): pads pile onto row num_out-1 and must be
            # covered by a bucket width or the plan build rejects them.
            padded = [_pad_edges(sr, m.dst, ep2, num_out_dir)
                      for m, sr in zip(mined, srcs)]
            deg_all = []
            for _, d2 in padded:
                dg = np.bincount(d2, minlength=num_out_dir)
                dg = dg[(dg > 0) & (dg <= max_width)]
                deg_all.append(dg)
            deg_all = np.sort(np.concatenate(deg_all)) if deg_all else \
                np.zeros(0, np.int64)
            widths = (_choose_widths(deg_all, lam_slots) if len(deg_all)
                      else [8])
            plans, nreals = [], []
            for (s2, d2), sr in zip(padded, srcs):
                plans.append(build_hyb_plan(s2, d2, None, num_out_dir,
                                            max_width, lam_slots,
                                            widths=widths))
                nreals.append(len(sr))
            for p in plans:
                p.pop("n_slots")
                p.pop("_n_iso", None)  # uniform stacking always uses inv
            out = _uniform_plans(plans, nreals, num_out_dir, ep2, max_width)
            out.pop("e2s", None)  # mask mode never maps slots to edges
            for b in out["buckets"]:
                b.pop("s2e", None)  # mask mode never reads slot->edge
            if out["top"] is not None:
                out["top"].pop("s2e", None)
            return out

        self.arrays = {
            "fwd": build_dir(fwd_mined, src_fwd, vp),
            "bwd": build_dir(bwd_mined, src_bwd, table),
            "lvl_fwd": tuple(jnp.asarray(l) for l in
                             _pad_levels(lv_fwd, pks_fwd)),
            "lvl_bwd": tuple(jnp.asarray(l) for l in
                             _pad_levels(lv_bwd, pks_bwd)),
        }
        if rank1_factor is not None:
            f_global = np.asarray(rank1_factor, np.float32)
            f_local = np.zeros((n, vp), np.float32)
            for i, s in enumerate(sharded.shards):
                gids = s.global_ids
                live = gids >= 0
                f_local[i, live] = f_global[gids[live]]
            # Ghost block (q, j) on shard s = row send_idx_q[s, j] of
            # shard q (parallel/halo.py layout).
            f_in = np.zeros((n, table), np.float32)
            f_in[:, :vp] = f_local
            for q, sq in enumerate(sharded.shards):
                # rows is already (n, max_h): row s_i is what shard q
                # sends to shard s_i — one vectorized assignment.
                rows = f_local[q][np.asarray(sq.send_idx)]
                f_in[:, vp + q * sharded.max_h:
                     vp + (q + 1) * sharded.max_h] = rows
            self.arrays["f_in"] = jnp.asarray(f_in)
            self.arrays["f_out"] = jnp.asarray(f_local)
        self.static = (table, vp,
                       None if gather_dtype is None
                       else jnp.dtype(gather_dtype), None, None, 0)

    def set_msgs_budget(self, budget: int) -> None:
        """Engine-scoped msgs scan-chunk guard (fit_msgs_budget)."""
        self.static = self.static[:5] + (int(budget),)

    @property
    def num_pairs(self) -> int:
        return sum(m.num_pairs for m in self.plan_fwd)

    @property
    def gather_itemsize(self) -> int:
        gdt = self.static[2]
        return 4 if gdt is None else np.dtype(gdt).itemsize

    def apply_static(self, arrays, h):
        """GCN factorized norms: diag(f_out) · A_unit · diag(f_in) · h,
        h = the (vp + n*max_h, F) halo table."""
        f_in = arrays["f_in"].astype(h.dtype)[:, None]
        u = reuse_unit_pass(self.static, arrays, h * f_in)
        return u * arrays["f_out"].astype(u.dtype)[:, None]

    def apply_dst(self, arrays, h, dst_val):
        """GAT dst-only attention: diag(dst_val) · A_unit · h."""
        u = reuse_unit_pass(self.static, arrays, h)
        return u * dst_val.astype(u.dtype)[:, None]

    def apply_unit(self, arrays, h):
        return reuse_unit_pass(self.static, arrays, h)

    def apply(self, arrays, h, val):
        raise NotImplementedError(
            "pair reuse requires factorizable edge weights; dynamic "
            "per-edge values cannot ride a rewrite — use kernel='hyb'")
