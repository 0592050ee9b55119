"""Can the aggregation gather go below bf16? fp8/int8 table byte-rate probe.

Round-2 established the XLA gather is byte-rate-bound (~85 GB/s,
pattern- and dtype-independent in GB/s: tools/probe_roofline.py), which
made bf16 tables the 2x production lever (--agg-bf16, narrow mode in
ops/degree_spmm.py). The open question: does the byte-rate law extend to
1-byte tables (fp8_e4m3 / int8)? If yes, a quantized-aggregation mode
doubles row rate again (4x over f32).

Measures on the real chip at Reddit shape (V=233k rows after slot
padding ~11.6M gathered rows, F=128):
  - raw gather+block-sum rate for f32 / bf16 / fp8_e4m3 / fp8_e5m2 / int8
  - with the narrow-chain idiom (sum(dtype=f32) AFTER an all-narrow chain)
    so the convert cannot hoist before the gather (CLAUDE.md trap).
  - HLO check: grep the compiled text for the gather operand dtype.

Usage: python tools/probe_fp8_gather.py [--quick]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dorylus_tpu.common.cache import enable_compile_cache  # noqa: E402

F = 128
BLOCK = 8  # rows summed per output row (mimics the degree-kernel block sum)


def time_loop(fn, args, iters):
    """N iterations inside one jit, scalar carry, float() readback."""

    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c, *a)
            return out.ravel()[7].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters, loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rows", type=int, default=11_600_000)
    ap.add_argument("--v", type=int, default=233_000)
    args_ns = ap.parse_args()

    enable_compile_cache()
    iters = 3 if args_ns.quick else 8
    V, R = args_ns.v, args_ns.rows
    R -= R % BLOCK

    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.integers(0, V, R).astype(np.int32)))
    table_f32 = jax.random.normal(jax.random.PRNGKey(0), (V, F), jnp.float32)

    dtypes = [
        ("f32", jnp.float32),
        ("bf16", jnp.bfloat16),
        ("fp8_e4m3", jnp.float8_e4m3fn),
        ("fp8_e5m2", jnp.float8_e5m2),
        ("int8", jnp.int8),
    ]

    results = {}
    print(f"gather rows={R} V={V} F={F} iters={iters}", flush=True)
    for name, dt in dtypes:
        if dt == jnp.int8:
            table = jnp.clip(table_f32 * 32.0, -127, 127).astype(jnp.int8)
        else:
            table = table_f32.astype(dt)
        bytes_per_row = F * table.dtype.itemsize

        def fwd(c, table, idx):
            # Perturb the INDEX with the carry before the gather (advisor
            # r4: a post-gather carry use leaves the gather loop-invariant
            # and at LICM's mercy; an input perturbation structurally
            # forces re-execution every iteration — bench.py's idiom).
            # One dynamic index per iteration: the 46 MB idx copy costs
            # ~0.06 ms against a ~36 ms gather.
            idx = idx.at[0].set(jnp.int32(c) % V)
            msgs = table[idx]  # (R, F) narrow
            out = jnp.sum(
                msgs.reshape(R // BLOCK, BLOCK, F), axis=1,
                dtype=jnp.float32,
            )
            return out

        try:
            dt_s, loop = time_loop(fwd, (table, idx), iters)
        except Exception as e:  # dtype unsupported in gather lowering
            print(f"{name:10s}: FAILED ({type(e).__name__}: {e})", flush=True)
            results[name] = {"error": str(e)[:200]}
            continue
        # HLO check (advisor r4, the convert-hoist trap): the compiled
        # gather's OPERAND must still be the narrow dtype — if XLA hoisted
        # a convert above the gather, the timing is a wide-gather lie.
        hlo_token = {"f32": "f32", "bf16": "bf16", "fp8_e4m3": "f8e4m3",
                     "fp8_e5m2": "f8e5m2", "int8": "s8"}[name]
        txt = loop.lower(table, idx).compile().as_text()
        glines = [ln for ln in txt.splitlines() if "gather(" in ln]
        narrow_ok = any(hlo_token in ln for ln in glines)
        if not narrow_ok:
            print(f"{name:10s}: HLO CHECK FAILED — no gather with "
                  f"{hlo_token} operand; timing below is NOT a "
                  f"narrow-gather number", flush=True)
        gbs = R * bytes_per_row / dt_s / 1e9
        rows_s = R / dt_s / 1e6
        print(
            f"{name:10s}: {dt_s*1e3:8.2f} ms  {gbs:6.1f} GB/s  "
            f"{rows_s:7.1f} M rows/s  hlo_narrow={narrow_ok}",
            flush=True,
        )
        results[name] = {
            "ms": dt_s * 1e3, "gb_s": gbs, "m_rows_s": rows_s,
            "bytes_per_row": bytes_per_row,
            "hlo_gather_operand_is_narrow": bool(narrow_ok),
            "hlo_gather_line": (glines[0].strip()[:200] if glines else ""),
        }

    out = Path(__file__).resolve().parent.parent / "benchmarks" / "results"
    out.mkdir(parents=True, exist_ok=True)
    (out / "fp8_gather_probe_r5.json").write_text(
        json.dumps(
            {
                "shape": {"rows": R, "V": V, "F": F},
                "platform": jax.devices()[0].platform,
                "results": results,
            },
            indent=2,
        )
    )
    print("wrote benchmarks/results/fp8_gather_probe_r5.json", flush=True)


if __name__ == "__main__":
    main()
