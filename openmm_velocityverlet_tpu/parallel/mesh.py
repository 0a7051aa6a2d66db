"""Multi-chip data-parallel execution over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.4); the honest TPU
counterpart of its intra-GPU atom parallelism is sharding the atom axis of the
hot pair sweep over ICI: each chip computes forces for its atom shard, and the
scalar reductions the thermostat needs (group kinetic energies, Ewald
structure factors) become psum collectives.  XLA inserts the collectives from
sharding annotations — there is no hand-written communication.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "atoms") -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def carry_shardings(carry, mesh: Mesh, axis_name: str = "atoms",
                    n_atoms=None):
    """Per-leaf NamedShardings for a step carry: big per-atom arrays get
    their leading axis sharded, everything else (NH chains, box, RNG key,
    scalars) is replicated.

    If ``n_atoms`` is given, leaves whose leading dim equals it are sharded
    (GSPMD handles non-divisible axes by padding the last shard, so real
    atom counts need not be multiples of the mesh size); otherwise any
    leading dim that is a strict multiple of the mesh size qualifies."""
    n_dev = mesh.devices.size

    def spec(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] > n_dev and (
                x.shape[0] == n_atoms if n_atoms is not None
                else x.shape[0] % n_dev == 0):
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, carry)


def shard_carry(carry, mesh: Mesh, axis_name: str = "atoms", n_atoms=None):
    """Place the step carry on the mesh with the atom axis of the big
    per-atom arrays sharded and everything else replicated."""
    shardings = carry_shardings(carry, mesh, axis_name, n_atoms)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), carry, shardings)


def sharded_step(step_fn, mesh: Mesh, example_carry,
                 axis_name: str = "atoms", n_atoms=None):
    """jit the single-step function with explicit in/out shardings derived
    from the carry layout; XLA propagates the shardings through the fused
    step and inserts psum/all-gather over ICI where the segment reductions
    and the NH chain scalars need global values."""
    shardings = carry_shardings(example_carry, mesh, axis_name, n_atoms)
    return jax.jit(step_fn, in_shardings=(shardings,),
                   out_shardings=shardings)
