"""Drude oscillator energy: anisotropic springs + Thole screened dipole pairs.

Mirrors the DrudeForce the reference builder constructs
(oplspsffile.py:1478-1517) and OpenMM's Drude plugin semantics:

* spring: E = 0.5*[k3*|d|^2 + k1*(d.u12)^2 + k2*(d.u34)^2] where d is the
  drude-parent displacement, u12/u34 unit vectors between the anisotropy
  parents, and (k1,k2,k3) derive from charge/polarizability/aniso12/aniso34:
      a3 = 3 - a1 - a2
      k3 = C q^2 / (alpha a3);  k1 = C q^2/(alpha a1) - k3;  k2 = ... a2 ...
  (isotropic particles: a1 = a2 = 1 so k1 = k2 = 0 and k3 = C q^2/alpha).
* Thole screened pair between dipoles (d1,p1) and (d2,p2): the four site-pair
  Coulomb terms with charges (+q1q2, -q1q2, -q1q2, +q1q2) each damped by
      damp(u) = 1 - (1 + u/2) exp(-u),   u = screen * r
  screen = (thole1+thole2)/(alpha1*alpha2)^(1/6) precomputed in the System.

Forces come from jax.grad of these energies (few terms, cheap backward).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..units import ONE_4PI_EPS0
from ..utils.pbc import minimum_image

_EPS = 1e-12


def drude_spring_energy(pos, box, pairs, k3, k1, k2, aniso):
    if pairs.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = pairs[:, 0] >= 0
    d = minimum_image(pos[jnp.maximum(pairs[:, 0], 0)]
                      - pos[jnp.maximum(pairs[:, 1], 0)], box)
    e = 0.5 * k3 * jnp.sum(d * d, -1)

    has_aniso = aniso[:, 0] >= 0
    p = jnp.maximum(aniso, 0)
    u12 = minimum_image(pos[p[:, 1]] - pos[p[:, 0]], box)
    u12 = u12 * jnp.where(has_aniso, 1.0, 0.0)[:, None]
    u12 = u12 / jnp.sqrt(jnp.sum(u12 * u12, -1, keepdims=True) + _EPS)
    u34 = minimum_image(pos[p[:, 3]] - pos[p[:, 2]], box)
    u34 = u34 * jnp.where(has_aniso, 1.0, 0.0)[:, None]
    u34 = u34 / jnp.sqrt(jnp.sum(u34 * u34, -1, keepdims=True) + _EPS)
    e = e + jnp.where(has_aniso,
                      0.5 * (k1 * jnp.sum(d * u12, -1) ** 2
                             + k2 * jnp.sum(d * u34, -1) ** 2), 0.0)
    return jnp.sum(jnp.where(mask, e, 0.0))


def thole_energy(pos, box, sites, qq, screen):
    """sites: (TP,4) = (drude1, parent1, drude2, parent2)."""
    if sites.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = sites[:, 0] >= 0
    s = jnp.maximum(sites, 0)
    # the four site pairs and their charge-product signs
    ii = jnp.stack([s[:, 0], s[:, 0], s[:, 1], s[:, 1]], 1)   # (TP,4)
    jj = jnp.stack([s[:, 2], s[:, 3], s[:, 2], s[:, 3]], 1)
    sign = jnp.asarray([1.0, -1.0, -1.0, 1.0], pos.dtype)
    dr = minimum_image(pos[ii] - pos[jj], box)                # (TP,4,3)
    r = jnp.sqrt(jnp.sum(dr * dr, -1) + _EPS)
    u = screen[:, None] * r
    damp = 1.0 - (1.0 + 0.5 * u) * jnp.exp(-u)
    e = ONE_4PI_EPS0 * (qq[:, None] * sign[None, :]) * damp / r
    return jnp.sum(jnp.where(mask[:, None], e, 0.0))
