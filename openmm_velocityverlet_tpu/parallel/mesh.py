"""Multi-chip data-parallel execution over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.4); the honest TPU
counterpart of its intra-GPU atom parallelism is sharding the atom axis of the
hot (N,K) neighbor kernel over ICI: positions are replicated (all-gather once
per step, they are small), each chip computes forces for its atom shard, and
the scalar reductions the thermostat needs (group kinetic energies, Ewald
structure factors) become psum collectives.  XLA inserts the collectives from
sharding annotations — there is no hand-written communication.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "atoms") -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def shard_carry(carry, mesh: Mesh, axis_name: str = "atoms"):
    """Place the step carry with the atom axis of the big per-atom arrays
    sharded and everything else replicated.  Array shapes must divide the mesh
    (the Context pads capacities to multiples of 8 already)."""
    n_dev = mesh.devices.size

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_dev == 0 and x.shape[0] > n_dev:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, carry)


def sharded_step(step_fn, mesh: Mesh, axis_name: str = "atoms"):
    """jit the single-step function with sharding constraints derived from the
    input layout; XLA propagates shardings through the whole fused step and
    inserts psum/all-gather over ICI where the segment reductions and the NH
    chain scalars need global values."""
    return jax.jit(step_fn)
