"""Virtual sites (LocalCoordinatesSite lone pairs).

The reference places lone pairs with OpenMM LocalCoordinatesSite
(oplspsffile.py:964-992): given three parent particles and weight triples,

    origin = sum wo_k r_k ;  xdir = sum wx_k r_k ;  ydir = sum wy_k r_k
    x = normalize(xdir); z = normalize(x cross ydir); y = z cross x
    r_site = origin + px*x + py*y + pz*z

Placement is a pure function of parent positions, so force redistribution is
just the transpose-Jacobian — obtained with jax.vjp instead of the hand-rolled
chain rule OpenMM's computeVirtualSites/distributeForces implement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def compute_vsites(pos, vsite_index, vsite_parents, origin_w, x_w, y_w, local):
    """Return positions with every virtual-site row overwritten by its
    parent-frame placement.  Differentiable."""
    if vsite_index.shape[0] == 0:
        return pos
    p = pos[vsite_parents]                       # (V,3parents,3)
    origin = jnp.einsum("vp,vpx->vx", origin_w, p)
    xdir = jnp.einsum("vp,vpx->vx", x_w, p)
    ydir = jnp.einsum("vp,vpx->vx", y_w, p)
    xhat = xdir / jnp.sqrt(jnp.sum(xdir * xdir, -1, keepdims=True) + _EPS)
    z = jnp.cross(xhat, ydir)
    zhat = z / jnp.sqrt(jnp.sum(z * z, -1, keepdims=True) + _EPS)
    yhat = jnp.cross(zhat, xhat)
    site = (origin + local[:, 0:1] * xhat + local[:, 1:2] * yhat
            + local[:, 2:3] * zhat)
    return pos.at[vsite_index].set(site)


def redistribute_forces(pos, forces, vsite_index, vsite_parents, origin_w,
                        x_w, y_w, local):
    """Move forces acting on virtual sites onto their parents (J^T f)."""
    if vsite_index.shape[0] == 0:
        return forces

    def place(p):
        return compute_vsites(p, vsite_index, vsite_parents, origin_w, x_w,
                              y_w, local)

    _, vjp = jax.vjp(place, pos)
    return vjp(forces)[0]
