"""Measure Mosaic primitive rates that bound any per-edge SpMM kernel.

  A. dynamic (8,128) row-block load from a VMEM table, serial loop
     (the inner op of a gather-by-dynamic-slice kernel)
  B. same but load+accumulate RMW (the scatter analog)
  C. per-row async DMA HBM->VMEM issue rate (gather-by-DMA design)
  D. lane dynamic_gather on (8,128) vregs, the chain kernel's primitive

Each kernel runs N ops inside one grid step; rate = N / time.
"""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_call(fn, args, tag, n_ops, iters=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:36s}: {dt*1e3:9.3f} ms  {n_ops/dt/1e6:9.1f} M ops/s",
          flush=True)
    return dt


# --- A/B: dynamic row-block ops on a VMEM table ---

def dyn_rows_kernel(idx_ref, tab_ref, out_ref, *, n_ops, rmw):
    def body(i, acc):
        r = idx_ref[0, i]
        blk = tab_ref[pl.ds(r * 8, 8), :]
        return acc + blk

    acc = jax.lax.fori_loop(0, n_ops, body, jnp.zeros((8, 128), jnp.float32))
    out_ref[:] = acc


def dyn_rmw_kernel(idx_ref, tab_ref, out_ref, scratch, *, n_ops):
    scratch[:] = jnp.zeros_like(scratch)

    def body(i, carry):
        r = idx_ref[0, i]
        cur = scratch[pl.ds(r * 8, 8), :]
        scratch[pl.ds(r * 8, 8), :] = cur + 1.0
        return carry

    jax.lax.fori_loop(0, n_ops, body, 0)
    out_ref[:] = scratch[pl.ds(0, 8), :]


def probe_dyn(n_ops=100_000, tab_blocks=512):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, tab_blocks, (1, n_ops)).astype(np.int32))
    tab = jnp.asarray(rng.normal(size=(tab_blocks * 8, 128)).astype(np.float32))

    f = pl.pallas_call(
        functools.partial(dyn_rows_kernel, n_ops=n_ops, rmw=False),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    bench_call(lambda i, t: f(i, t), (idx, tab),
               f"A dyn (8,128) load VMEM", n_ops)

    g = pl.pallas_call(
        functools.partial(dyn_rmw_kernel, n_ops=n_ops),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tab_blocks * 8, 128), jnp.float32)],
    )
    bench_call(lambda i, t: g(i, t), (idx, tab),
               f"B dyn (8,128) RMW VMEM", n_ops)


# --- C: per-row DMA HBM -> VMEM ---

def dma_rows_kernel(idx_ref, hbm_ref, out_ref, buf, sem, *, n_ops, depth):
    def issue(slot, i):
        r = idx_ref[0, i]
        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(r, 1), :],
            buf.at[pl.ds(slot, 1), :],
            sem.at[slot],
        ).start()

    def wait(slot):
        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(0, 1), :], buf.at[pl.ds(slot, 1), :], sem.at[slot]
        ).wait()

    def body(i, carry):
        slot = jax.lax.rem(i, depth)
        wait(slot)
        issue(slot, i)
        return carry

    for s in range(depth):
        issue(s, s)
    jax.lax.fori_loop(depth, n_ops, body, 0)
    for s in range(depth):
        wait(s)
    out_ref[:] = jnp.broadcast_to(buf[pl.ds(0, 1), :], (8, 128))


def probe_dma(n_ops=100_000, rows=65_536, depth=16):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows, (1, n_ops)).astype(np.int32))
    tab = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))

    f = pl.pallas_call(
        functools.partial(dma_rows_kernel, n_ops=n_ops, depth=depth),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((depth, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))],
    )
    bench_call(lambda i, t: f(i, t), (idx, tab),
               f"C per-row DMA HBM depth={depth}", n_ops)


# --- D: lane dynamic_gather rate on (8,128) ---

def lane_gather_kernel(idx_ref, tab_ref, out_ref, *, n_ops):
    tab = tab_ref[:]

    def body(i, acc):
        ids = jnp.broadcast_to(idx_ref[pl.ds(i % 64, 1), :], (8, 128)
                               ).astype(jnp.int32)
        return acc + jnp.take_along_axis(tab, ids, axis=1)

    out_ref[:] = jax.lax.fori_loop(0, n_ops, body,
                                   jnp.zeros((8, 128), jnp.float32))


def probe_lane_gather(n_ops=100_000):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 128, (64, 128)).astype(np.int32))
    tab = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    f = pl.pallas_call(
        functools.partial(lane_gather_kernel, n_ops=n_ops),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    # each op gathers 128 lanes x 8 sublanes = 1024 elements
    bench_call(lambda i, t: f(i, t), (idx, tab),
               "D lane dyn_gather (8,128)", n_ops)


if __name__ == "__main__":
    probe_dyn()
    probe_lane_gather()
    probe_dma()
