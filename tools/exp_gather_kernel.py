#!/usr/bin/env python3
"""Experiment: can Mosaic do dynamic gathers from VMEM inside a Pallas
kernel, and at what throughput?  Decides whether a block-local Pallas term
kernel can beat the XLA gather tail (~1 row/cycle on (N,3) HBM gathers).

Tries, per variant, gathering ROWS=131072 rows/lanes per call from a
(1024, 128) resident block, 100 calls.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 131072
BLK = 1024


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(100):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 100
    return out, dt


def variant_sublane():
    """Gather rows along the SUBLANE (major) dim: out[i] = block[idx[i], :]."""
    def kernel(blk_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take(blk_ref[:, :], idx_ref[:, 0], axis=0)

    @jax.jit
    def run(blk, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(blk, idx)

    blk = jnp.asarray(np.random.randn(BLK, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, BLK, (ROWS, 1)), jnp.int32)
    return run, (blk, idx)


def variant_lane():
    """Gather along LANES (minor dim): out[:, j] = block[:, idx[j]]."""
    def kernel(blk_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take(blk_ref[:, :], idx_ref[0, :], axis=1)

    @jax.jit
    def run(blk, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, ROWS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(blk, idx)

    blk = jnp.asarray(np.random.randn(8, BLK), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, BLK, (1, ROWS)), jnp.int32)
    return run, (blk, idx)


def variant_lane_tiled():
    """Lane gather but with per-128 tile indices (take_along_axis style):
    out[:, t*128+j] = block[:, idx[t*128+j]] where idx < BLK."""
    def kernel(blk_ref, idx_ref, out_ref):
        # gather within each 128-lane register via take_along_axis semantics
        out_ref[:, :] = jnp.take_along_axis(
            jnp.broadcast_to(blk_ref[:, :], (8, BLK)),
            jnp.broadcast_to(idx_ref[0:1, :] % 128, (8, ROWS)), axis=1)

    @jax.jit
    def run(blk, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, ROWS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(blk, idx)

    blk = jnp.asarray(np.random.randn(8, BLK), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, BLK, (1, ROWS)), jnp.int32)
    return run, (blk, idx)


def variant_xla_baseline():
    """XLA whole-array row gather baseline for comparison."""
    @jax.jit
    def run(src, idx):
        return src[idx]

    src = jnp.asarray(np.random.randn(20000, 3), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 20000, (ROWS,)), jnp.int32)
    return run, (src, idx)


def main():
    print("backend:", jax.default_backend())
    for name, maker in [("xla_row_gather(20k,3)", variant_xla_baseline),
                        ("pallas_sublane", variant_sublane),
                        ("pallas_lane", variant_lane),
                        ("pallas_lane_tiled", variant_lane_tiled)]:
        try:
            fn, args = maker()
            out, dt = bench(fn, *args)
            per_row = dt / ROWS * 1e9
            print(f"{name:24s} {dt*1e6:9.1f} us/call  {per_row:6.3f} ns/row")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
