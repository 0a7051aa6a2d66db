"""Bonded energy terms (bond / angle / Urey-Bradley / dihedral / improper).

Functional forms follow the CHARMM conventions the reference force field uses
(ff.prm headers in /root/reference/examples/models/*/ff.prm and the builder in
examples/ommhelper/oplspsffile.py:1000-1133):

* bond / UB:  E = 0.5 k (r - r0)^2           (k = 2 * K_charmm after conversion)
* angle:      E = 0.5 k (theta - theta0)^2
* dihedral:   E = k (1 + cos(n phi - delta))
* improper:   E = k (1 - cos(2 theta))        (OPLS, atoms pre-ordered a2,a3,a1,a4)

Forces are obtained by differentiating the total energy with jax.grad, so only
energies are defined here.  All index arrays are padded with -1 and masked.
Periodic minimum-image displacements are used throughout, matching the
reference's `setUsesPeriodicBoundaryConditions(True)` on every bonded force
(oplspsffile.py:1002, 1016, ...).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pbc import minimum_image

_EPS = 1e-12


def _gather(pos, idx):
    return pos[jnp.maximum(idx, 0)]


def bond_energy(pos, box, bonds, r0, k):
    if bonds.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = bonds[:, 0] >= 0
    ri = _gather(pos, bonds[:, 0])
    rj = _gather(pos, bonds[:, 1])
    dr = minimum_image(ri - rj, box)
    r = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + _EPS)
    e = 0.5 * k * (r - r0) ** 2
    return jnp.sum(jnp.where(mask, e, 0.0))


def angle_energy(pos, box, angles, theta0, k):
    if angles.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = angles[:, 0] >= 0
    ri = _gather(pos, angles[:, 0])
    rj = _gather(pos, angles[:, 1])
    rk = _gather(pos, angles[:, 2])
    v1 = minimum_image(ri - rj, box)
    v2 = minimum_image(rk - rj, box)
    cos_t = jnp.sum(v1 * v2, -1) * jnp.minimum(
        1.0 / jnp.sqrt(jnp.sum(v1 * v1, -1) * jnp.sum(v2 * v2, -1) + _EPS), 1e12)
    cos_t = jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    e = 0.5 * k * (theta - theta0) ** 2
    return jnp.sum(jnp.where(mask, e, 0.0))


def _dihedral_angle(pos, box, idx):
    """Signed dihedral angle phi for (N,4) index rows."""
    p0 = _gather(pos, idx[:, 0])
    p1 = _gather(pos, idx[:, 1])
    p2 = _gather(pos, idx[:, 2])
    p3 = _gather(pos, idx[:, 3])
    b1 = minimum_image(p1 - p0, box)
    b2 = minimum_image(p2 - p1, box)
    b3 = minimum_image(p3 - p2, box)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.sqrt(jnp.sum(b2 * b2, -1, keepdims=True) + _EPS))
    x = jnp.sum(n1 * n2, -1)
    y = jnp.sum(m1 * n2, -1)
    return jnp.arctan2(y, x + _EPS * (x == 0))


def dihedral_energy(pos, box, dihedrals, n, phase, k):
    if dihedrals.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = dihedrals[:, 0] >= 0
    phi = _dihedral_angle(pos, box, dihedrals)
    e = k * (1.0 + jnp.cos(n * phi - phase))
    return jnp.sum(jnp.where(mask, e, 0.0))


def improper_energy(pos, box, impropers, k):
    """OPLS improper E = k (1 - cos 2 theta), oplspsffile.py:1125-1133."""
    if impropers.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = impropers[:, 0] >= 0
    phi = _dihedral_angle(pos, box, impropers)
    e = k * (1.0 - jnp.cos(2.0 * phi))
    return jnp.sum(jnp.where(mask, e, 0.0))


def bonded_energy(system, pos, box):
    """Total bonded energy, returned as a dict of terms (mirrors the
    reference's per-force-group decomposition, oplspsffile.py:169-177)."""
    return {
        "bond": bond_energy(pos, box, system.bonds, system.bond_r0, system.bond_k),
        "angle": angle_energy(pos, box, system.angles, system.angle_theta0,
                              system.angle_k),
        "urey_bradley": bond_energy(pos, box, system.ub_bonds, system.ub_r0,
                                    system.ub_k),
        "dihedral": dihedral_energy(pos, box, system.dihedrals, system.dihedral_n,
                                    system.dihedral_phase, system.dihedral_k),
        "improper": improper_energy(pos, box, system.impropers, system.improper_k),
    }
