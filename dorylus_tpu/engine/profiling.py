"""Per-stage profiling + cost accounting.

The reference reports per-stage times (Aggregation / ApplyVertex / Scatter /
ApplyEdge, fwd+bwd per layer — engine/utils.cpp:139-291) and dollar cost
(calculate-price.py: lambda billed ms + EC2). Under XLA the stages are fused
into one program, so stage attribution here times separately-compiled
sub-programs (same math, unfused); the totals bracket the fused step. Cost
becomes chip-seconds x an hourly chip price.

Timing methodology (tunnel-safe): N iterations inside one jit with a scalar
carry/output — remote backends return early from block_until_ready and
eagerly download large outputs.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from dorylus_tpu.models.base import GraphBatch
from dorylus_tpu.ops.spmm import aggregate

# Public on-demand list price per chip-hour (us-central, v5e, 2025); used
# only for the report's cost estimate — override via report_cost(price=...).
DEFAULT_CHIP_USD_PER_HOUR = 1.20


def _scalar_time(fn, *args, iters: int = 5) -> float:
    @jax.jit
    def loop(*args):
        def body(i, c):
            out = fn(*args, c)
            return jnp.asarray(out).ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def profile_stages(model, params, batch: GraphBatch,
                   iters: int = 5) -> Dict[str, float]:
    """Stage timings in ms: aggregation per layer, forward, loss+grad."""
    out: Dict[str, float] = {}

    h = batch.x
    for l in range(model.layers.num_layers):
        w = params[f"w{l}"]
        fin, fout = w.shape
        f = min(fin, fout)
        hh = h[:, :f] if h.shape[1] >= f else jnp.pad(h, ((0, 0), (0, f - h.shape[1])))

        def agg_fn(hh, batch, c):
            return aggregate(hh + c * 1e-12, batch.src, batch.dst,
                             batch.edge_val, batch.self_val, sorted_dst=True)

        out[f"aggregate_l{l}_ms"] = 1e3 * _scalar_time(agg_fn, hh, batch,
                                                       iters=iters)
        h = jnp.zeros((batch.x.shape[0], fout), batch.x.dtype)

    def fwd_fn(params, batch, c):
        first = params[list(params.keys())[0]]
        p2 = dict(params)
        k0 = list(params.keys())[0]
        p2[k0] = first + c * 1e-12
        return model.forward(p2, batch)

    out["forward_ms"] = 1e3 * _scalar_time(fwd_fn, params, batch, iters=iters)

    def grad_fn(params, batch, c):
        k0 = list(params.keys())[0]
        p2 = dict(params)
        p2[k0] = params[k0] + c * 1e-12
        g = jax.grad(model.loss)(p2, batch)
        return g[k0]

    out["loss_and_grad_ms"] = 1e3 * _scalar_time(grad_fn, params, batch,
                                                 iters=iters)
    return out


def report_cost(total_time_s: float, n_chips: int = 1,
                price_per_chip_hour: float = DEFAULT_CHIP_USD_PER_HOUR) -> dict:
    """Chip-seconds + dollar estimate (calculate-price.py analog)."""
    chip_s = total_time_s * n_chips
    return {
        "chip_seconds": round(chip_s, 2),
        "price_per_chip_hour_usd": price_per_chip_hour,
        "estimated_cost_usd": round(chip_s / 3600.0 * price_per_chip_hour, 6),
    }
