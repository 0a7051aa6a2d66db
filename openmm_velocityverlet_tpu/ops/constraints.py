"""Holonomic distance constraints: iterative SHAKE (positions) and RATTLE
(velocities), fully vectorized and scatter-free.

The reference delegates constraints to OpenMM's CudaIntegrationUtilities
(applyConstraints / applyVelocityConstraints, called from
CudaVVKernels.cpp:151,176,334,425).  Here both phases are Jacobi-style fixed
-point iterations inside jit:

* every constraint's correction is computed in parallel (C,3);
* every atom then *gathers* the corrections of its incident constraints
  (per-atom incidence table, at most A per atom) — no scatter in the loop;
* iteration stops on the 1e-5 relative tolerance the reference sets
  (VVIntegrator.cpp:56) or a fixed max iteration count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.pbc import minimum_image

i32 = jnp.int32
f32 = jnp.float32


@struct.dataclass
class ConstraintData:
    pairs: jnp.ndarray       # (C,2) i32
    dist: jnp.ndarray        # (C,)
    inv_mass_sum: jnp.ndarray  # (C,) 1/mi + 1/mj
    atom_cons: jnp.ndarray   # (N,A) i32 constraint ids incident to atom, -1 pad
    atom_sign: jnp.ndarray   # (N,A) f32 +1 if atom is pair[...,0], else -1
    tolerance: float = struct.field(pytree_node=False, default=1e-5)
    max_iterations: int = struct.field(pytree_node=False, default=150)

    @property
    def n_constraints(self):
        return self.pairs.shape[0]


def build_constraint_data(pairs, dists, inv_masses, tolerance=1e-5,
                          max_iterations=150) -> ConstraintData:
    pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
    dists = np.asarray(dists, np.float32).reshape(-1)
    n = len(inv_masses)
    c = pairs.shape[0]
    incid = [[] for _ in range(n)]
    signs = [[] for _ in range(n)]
    for ci, (a, b) in enumerate(pairs):
        incid[a].append(ci)
        signs[a].append(1.0)
        incid[b].append(ci)
        signs[b].append(-1.0)
    a_max = max((len(x) for x in incid), default=0)
    a_max = max(a_max, 1)
    atom_cons = np.full((n, a_max), -1, np.int32)
    atom_sign = np.zeros((n, a_max), np.float32)
    for i in range(n):
        for k, (ci, s) in enumerate(zip(incid[i], signs[i])):
            atom_cons[i, k] = ci
            atom_sign[i, k] = s
    ims = np.asarray(inv_masses, np.float32)
    inv_mass_sum = ims[pairs[:, 0]] + ims[pairs[:, 1]] if c else np.zeros((0,), np.float32)
    # host numpy: embeds as compile-time constants inside the jitted step so
    # TPU gathers take the fast constant-index lowering
    return ConstraintData(
        pairs=pairs, dist=dists, inv_mass_sum=inv_mass_sum,
        atom_cons=atom_cons, atom_sign=atom_sign,
        tolerance=tolerance, max_iterations=max_iterations)


def _apply_corrections(x, cons: ConstraintData, g, ref, inv_masses):
    """x_a += -inv_m_a * sum_{c incident} sign * g_c * ref_c  (gather form)."""
    cid = jnp.maximum(cons.atom_cons, 0)                     # (N,A)
    valid = (cons.atom_cons >= 0).astype(x.dtype)
    contrib = (g[cid] * valid * cons.atom_sign)[..., None] * ref[cid]  # (N,A,3)
    return x - inv_masses[:, None] * jnp.sum(contrib, axis=1)


def apply_position_constraints(pos_ref, pos_new, box, cons: ConstraintData,
                               inv_masses):
    """SHAKE: move pos_new so that constrained distances equal their targets,
    using the (constraint-satisfying) reference geometry pos_ref for the
    correction directions."""
    if cons.n_constraints == 0:
        return pos_new
    i, j = cons.pairs[:, 0], cons.pairs[:, 1]
    ref = minimum_image(pos_ref[i] - pos_ref[j], box)          # (C,3) fixed
    d2 = cons.dist * cons.dist

    def cond(carry):
        pos, it, err = carry
        return (err > cons.tolerance) & (it < cons.max_iterations)

    def body(carry):
        pos, it, _ = carry
        delta = minimum_image(pos[i] - pos[j], box)
        r2 = jnp.sum(delta * delta, -1)
        diff = r2 - d2
        denom = 2.0 * cons.inv_mass_sum * jnp.sum(delta * ref, -1)
        g = diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        pos = _apply_corrections(pos, cons, g, ref, inv_masses)
        err = jnp.max(jnp.abs(diff) / d2)
        return pos, it + 1, err

    pos, _, _ = jax.lax.while_loop(cond, body,
                                   (pos_new, jnp.zeros((), i32),
                                    jnp.ones((), pos_new.dtype)))
    return pos


def apply_velocity_constraints(pos, vel, box, cons: ConstraintData, inv_masses):
    """RATTLE: project velocities so d/dt of each constrained distance is 0."""
    if cons.n_constraints == 0:
        return vel
    i, j = cons.pairs[:, 0], cons.pairs[:, 1]
    ref = minimum_image(pos[i] - pos[j], box)
    d2 = jnp.sum(ref * ref, -1)
    denom = cons.inv_mass_sum * d2
    scale = 1.0 / jnp.where(denom > 1e-12, denom, 1e-12)

    def cond(carry):
        vel, it, err = carry
        return (err > cons.tolerance) & (it < cons.max_iterations)

    def body(carry):
        vel, it, _ = carry
        rv = jnp.sum((vel[i] - vel[j]) * ref, -1)
        g = rv * scale
        vel = _apply_corrections(vel, cons, g, ref, inv_masses)
        # relative velocity along the bond divided by bond length (1/ps);
        # the projection is linear so this converges geometrically.
        err = jnp.max(jnp.abs(rv) / jnp.maximum(d2, 1e-12))
        return vel, it + 1, err

    vel, _, _ = jax.lax.while_loop(cond, body,
                                   (vel, jnp.zeros((), i32),
                                    jnp.ones((), vel.dtype)))
    return vel
