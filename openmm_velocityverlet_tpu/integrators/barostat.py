"""Monte-Carlo barostats (iso / anisotropic xyz,xy,z / membrane semi-iso).

The reference gets these from OpenMM via ``apply_mc_barostat``
(examples/ommhelper/util.py:32-54).  Implemented here as a jit-compatible MC
volume move executed inside ``updateContextState`` (the same point in the step
the reference invokes it, VVIntegrator.cpp:234): scale the box and molecule
centers of mass, evaluate the energy difference, accept with

    P_acc = exp(-(dE + P dV - N_mol kT ln(V'/V)) / kT)

and adapt the move size every 10 attempts exactly like OpenMM's
MonteCarloBarostatImpl.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..units import BAR_TO_KJ_MOL_NM3, BOLTZ

f32 = jnp.float32
i32 = jnp.int32


@struct.dataclass
class BarostatConfig:
    kind: str = struct.field(pytree_node=False)      # iso|xyz|xy|z|semi-iso
    pressure: float = struct.field(pytree_node=False)  # bar
    temperature: float = struct.field(pytree_node=False)
    frequency: int = struct.field(pytree_node=False, default=100)


@struct.dataclass
class BarostatState:
    volume_scale: jnp.ndarray   # () f32 — current move size (nm^3)
    n_attempted: jnp.ndarray    # () i32
    n_accepted: jnp.ndarray     # () i32
    key: jnp.ndarray            # (2,) u32


def make_barostat_state(initial_volume, seed=7):
    return BarostatState(
        volume_scale=jnp.asarray(0.01 * initial_volume, f32),
        n_attempted=jnp.zeros((), i32),
        n_accepted=jnp.zeros((), i32),
        key=jax.random.PRNGKey(seed))


def _axis_weights(kind, key):
    """Which box axes the attempt scales (1.0 = scaled)."""
    if kind == "iso":
        return jnp.ones((3,), f32), key
    if kind == "xyz":
        key, k = jax.random.split(key)
        ax = jax.random.randint(k, (), 0, 3)
        return (jnp.arange(3) == ax).astype(f32), key
    if kind == "xy":
        key, k = jax.random.split(key)
        ax = jax.random.randint(k, (), 0, 2)
        return (jnp.arange(3) == ax).astype(f32), key
    if kind == "z":
        return jnp.asarray([0.0, 0.0, 1.0], f32), key
    if kind == "semi-iso":  # XY isotropic-coupled or Z, alternating randomly
        key, k = jax.random.split(key)
        pick_z = jax.random.bernoulli(k)
        w = jnp.where(pick_z, jnp.asarray([0.0, 0.0, 1.0], f32),
                      jnp.asarray([1.0, 1.0, 0.0], f32))
        return w, key
    raise ValueError(f"unknown barostat kind {kind}")


def attempt_move(cfg: BarostatConfig, bstate: BarostatState, pos, box,
                 mol_id, mol_masses, mol_inv_masses, masses, energy_fn,
                 mol_table=None):
    """One MC volume attempt.  energy_fn(pos, box) -> scalar potential.
    Returns (accepted, pos', box', bstate')."""
    key = bstate.key
    weights, key = _axis_weights(cfg.kind, key)
    key, k_dv, k_acc = jax.random.split(key, 3)

    vol = box[0] * box[1] * box[2]
    delta_v = bstate.volume_scale * (2.0 * jax.random.uniform(k_dv) - 1.0)
    new_vol = vol + delta_v
    n_scaled = jnp.sum(weights)
    ratio = new_vol / vol
    axis_scale = jnp.where(weights > 0, ratio ** (1.0 / n_scaled), 1.0)

    # molecular COM scaling (keeps intramolecular geometry rigid)
    n_mol = mol_masses.shape[0]
    if mol_table is not None:
        import numpy as _np
        idx = _np.maximum(_np.asarray(mol_table), 0)
        valid = (_np.asarray(mol_table) >= 0)
        mv = (_np.asarray(masses)[idx] * valid)[..., None] * pos[idx]
        com = jnp.sum(mv, axis=1) * mol_inv_masses[:, None]
    else:
        com = (jax.ops.segment_sum(masses[:, None] * pos, mol_id,
                                   num_segments=n_mol)
               * mol_inv_masses[:, None])
    shift = com * (axis_scale[None, :] - 1.0)
    new_pos = pos + shift[mol_id]
    new_box = box * axis_scale

    e_old = energy_fn(pos, box)
    e_new = energy_fn(new_pos, new_box)
    kt = BOLTZ * cfg.temperature
    p_int = cfg.pressure * BAR_TO_KJ_MOL_NM3
    w = (e_new - e_old + p_int * delta_v
         - n_mol * kt * jnp.log(new_vol / vol))
    accept = (w <= 0) | (jax.random.uniform(k_acc) < jnp.exp(-w / kt))

    pos = jnp.where(accept, new_pos, pos)
    box = jnp.where(accept, new_box, box)
    n_att = bstate.n_attempted + 1
    n_acc = bstate.n_accepted + accept.astype(i32)

    # OpenMM-style adaptation of the move size every 10 attempts
    def adapt(args):
        vs, na, nc = args
        frac = nc.astype(f32) / na.astype(f32)
        vs = jnp.where(frac < 0.25, vs / 1.1, vs)
        vs = jnp.where(frac > 0.75, jnp.minimum(vs * 1.1, vol * 0.3), vs)
        return vs, jnp.zeros((), i32), jnp.zeros((), i32)

    vs, n_att, n_acc = jax.lax.cond(
        n_att >= 10, adapt, lambda a: a,
        (bstate.volume_scale, n_att, n_acc))

    return accept, pos, box, BarostatState(
        volume_scale=vs, n_attempted=n_att, n_accepted=n_acc, key=key)
