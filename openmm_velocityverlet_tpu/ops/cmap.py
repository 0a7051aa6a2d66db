"""CMAP torsion cross-terms (CHARMM correction maps), TPU-native.

Reference behavior being reproduced (cited for parity, not copied):
* PSF: each cross-term is 8 atom indices = two dihedrals phi/psi
  (oplspsffile.py:430-465; "consecutive" 5-atom terms are the special case
  where atoms 5-8 equal atoms 2-5).
* Parameter matching: the 8-type key with each 4-type half canonicalized as
  min(fwd, reversed) — no wildcards (oplspsffile.py:692-710).
* Evaluation: OpenMM's CMAPTorsionForce (oplspsffile.py:1134-1169, force
  group 3) interpolates the map with a bicubic patch per grid cell whose
  knot derivatives come from periodic cubic splines through the grid rows
  and columns (C1-continuous, exact at the knots).

TPU-first formulation: all spline fitting happens host-side in numpy at
build time, producing one dense (R, R, 4, 4) monomial-coefficient tensor
per map.  On device a term costs two dihedral evaluations, one (4,4)
coefficient gather and a 16-term Horner polynomial — fully differentiable,
so forces flow through jax.grad with the other smooth terms (cross-term
counts are tiny; none of the bundled reference models carry any).

Grid convention: index 0 of each axis is the angle -pi, spacing 2*pi/R
(the CHARMM .prm layout).  The interpolation works directly in that frame
— the reference's switch to [0, 360) is an OpenMM-internal storage detail
with no physical content.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .bonded import _dihedral_angle
from ..units import PI


# ---------------------------------------------------------------- host side

def periodic_spline_slopes(y, axis=0):
    """Knot first-derivatives (in index units, h = 1) of the periodic
    natural cubic spline through ``y`` along ``axis``.

    Uniform spacing, periodic closure: the C2 spline slopes d_i solve the
    cyclic tridiagonal system d_{i-1} + 4 d_i + d_{i+1} = 3 (y_{i+1} -
    y_{i-1}).  Grids are tiny (R <= 24 for every CHARMM map), so a dense
    solve is cheapest and exact.
    """
    y = np.asarray(y, np.float64)
    y = np.moveaxis(y, axis, 0)
    n = y.shape[0]
    A = 4.0 * np.eye(n)
    idx = np.arange(n)
    A[idx, (idx + 1) % n] = 1.0
    A[idx, (idx - 1) % n] = 1.0
    rhs = 3.0 * (np.roll(y, -1, 0) - np.roll(y, 1, 0))
    d = np.linalg.solve(A, rhs.reshape(n, -1)).reshape(y.shape)
    return np.moveaxis(d, 0, axis)


@functools.lru_cache(maxsize=1)
def _bicubic_solve_matrix():
    """Inverse of the 16x16 system mapping monomial coefficients c[a,b]
    (E = sum c[a,b] t^a u^b on the unit cell) to the 16 corner constraints
    [f, df/dt, df/du, d2f/dtdu] x [(0,0), (1,0), (0,1), (1,1)]."""
    M = np.zeros((16, 16))
    corners = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    for ci, (t, u) in enumerate(corners):
        for a in range(4):
            for bb in range(4):
                col = 4 * a + bb
                ta = t ** a
                ub = u ** bb
                dta = a * t ** (a - 1) if a else 0.0
                dub = bb * u ** (bb - 1) if bb else 0.0
                M[ci, col] = ta * ub
                M[4 + ci, col] = dta * ub
                M[8 + ci, col] = ta * dub
                M[12 + ci, col] = dta * dub
    return np.linalg.inv(M)


def build_cmap_coeffs(grid):
    """(R, R) energy grid -> (R, R, 4, 4) bicubic monomial coefficients.

    grid[i, j] = E(phi_i, psi_j) with phi_i = -pi + 2*pi*i/R (same for
    psi).  Cell (i, j) covers [phi_i, phi_{i+1}] x [psi_j, psi_{j+1}] in
    local coordinates t, u in [0, 1].  Knot derivatives (index units) come
    from periodic cubic splines; the cross derivative splines the phi-
    slopes along psi — the standard construction OpenMM's SplineFitter
    applies for CMAPTorsionForce.
    """
    g = np.asarray(grid, np.float64)
    if g.ndim != 2 or g.shape[0] != g.shape[1]:
        raise ValueError(f"CMAP grid must be square, got {g.shape}")
    ft = periodic_spline_slopes(g, axis=0)         # dE/dt at knots
    fu = periodic_spline_slopes(g, axis=1)         # dE/du
    ftu = periodic_spline_slopes(ft, axis=1)       # d2E/dtdu

    def corners(a):
        a10 = np.roll(a, -1, 0)
        a01 = np.roll(a, -1, 1)
        a11 = np.roll(a10, -1, 1)
        return [a, a10, a01, a11]

    b = np.stack(corners(g) + corners(ft) + corners(fu) + corners(ftu),
                 axis=-1)                           # (R, R, 16)
    c = b @ _bicubic_solve_matrix().T               # (R, R, 16)
    return c.reshape(g.shape[0], g.shape[1], 4, 4).astype(np.float32)


def pack_cmap_maps(grids):
    """Pad per-map coefficient tensors to a common resolution.

    Returns (coeffs (M, Rmax, Rmax, 4, 4) f32, res (M,) i32).  Mixed
    resolutions are padded with zeros; evaluation indexes with the true
    per-map resolution so padding is never read.
    """
    if not grids:
        return (np.zeros((0, 1, 1, 4, 4), np.float32),
                np.zeros((0,), np.int32))
    coeffs = [build_cmap_coeffs(g) for g in grids]
    rmax = max(c.shape[0] for c in coeffs)
    out = np.zeros((len(coeffs), rmax, rmax, 4, 4), np.float32)
    res = np.zeros(len(coeffs), np.int32)
    for m, c in enumerate(coeffs):
        r = c.shape[0]
        out[m, :r, :r] = c
        res[m] = r
    return out, res


# -------------------------------------------------------------- device side

def cmap_energy(pos, box, cmap_atoms, cmap_map, cmap_coeffs, cmap_res):
    """Total CMAP energy (differentiable; forces via jax.grad).

    cmap_atoms:  (T, 8) i32 — phi = dihedral(atoms[:4]), psi = atoms[4:]
    cmap_map:    (T,)   i32 — map index per term
    cmap_coeffs: (M, Rmax, Rmax, 4, 4) f32 from pack_cmap_maps
    cmap_res:    (M,)   i32 true resolution per map
    """
    if cmap_atoms.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    mask = cmap_atoms[:, 0] >= 0
    safe = jnp.where(mask[:, None], cmap_atoms, 0)
    phi = _dihedral_angle(pos, box, safe[:, :4])
    psi = _dihedral_angle(pos, box, safe[:, 4:])
    r = cmap_res[cmap_map]                          # (T,) i32
    rf = r.astype(pos.dtype)
    s_phi = (phi + PI) * (rf / (2.0 * PI))          # in [0, R]
    s_psi = (psi + PI) * (rf / (2.0 * PI))
    i = jnp.clip(jnp.floor(s_phi).astype(jnp.int32), 0, r - 1)
    j = jnp.clip(jnp.floor(s_psi).astype(jnp.int32), 0, r - 1)
    t = s_phi - i.astype(pos.dtype)
    u = s_psi - j.astype(pos.dtype)
    c = cmap_coeffs[cmap_map, i, j]                 # (T, 4, 4)
    tv = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], -1)  # (T,4)
    uv = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], -1)
    e = jnp.einsum("tab,ta,tb->t", c, tv, uv)
    return jnp.sum(jnp.where(mask, e, 0.0))
