"""Smooth particle-mesh Ewald (FFT) reciprocal space.

The engine's primary reciprocal-space path is the exact k-space sum as one
fused MXU matmul (ops/ewald.py) — for the reference's system sizes
(8k-42k atoms, kmax <= (7,7,48)) the exact sum is both faster on TPU and
exactly differentiable, because its cost is a single (2AB,n)x(n,2C)
contraction while PME pays gather/scatter spreading that TPUs execute at
~1 row/cycle.  This module provides the PME path behind the same
interface for (a) asymptotic parity with the reference's OpenMM PME
(oplspsffile.py:1174-1187) and (b) very large boxes where kmax growth makes
the exact sum uncompetitive.  ``choose_reciprocal`` picks per system from
the measured cost model.

Formulation: Essmann et al. 1995 smooth PME, B-spline order 4.

    E = C * 2 pi / V * sum_{m != 0} exp(-k^2 / 4 beta^2) / k^2 * |S(m)|^2
    S(m) = FFT(Q)[m] / (bx(mx) by(my) bz(mz))

with Q the B-spline-spread charge grid and b the Euler spline factors.
Spreading runs scatter-free where it matters: charges are binned by z-cell
(one static-shape sort per call), each z-plane of Q is assembled from 4
batched (Kx, M) x (M, Ky) matmuls over the contributing bins — the
"sort-by-cell + dense segment ops" plan of SURVEY section 7.4-1.  Forces
come from jax.grad: the backward pass is the same batched matmuls plus the
analytic B-spline derivative, no scatter anywhere.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0, PI


def choose_grid(box, spacing: float = 0.10) -> tuple:
    """FFT-friendly grid dims (factors 2/3/5 only) with mesh spacing <=
    ``spacing`` nm (OpenMM default PME mesh density is ~1 point/A)."""
    def good(k):
        for f in (2, 3, 5):
            while k % f == 0:
                k //= f
        return k == 1

    dims = []
    for L in np.asarray(box, np.float64).reshape(-1)[:3]:
        k = max(int(math.ceil(L / spacing)), 4)
        while not good(k):
            k += 1
        dims.append(k)
    return tuple(dims)


def _bspline4(t):
    """Order-4 cardinal B-spline weights at fractional offset t in [0,1):
    returns w[...,4] for grid points floor(u)-3+j+... (see _spread for the
    offset convention, validated against the exact k-sum in tests)."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0          # (1-t)^3/6
    w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
    w3 = t3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=16)
def _euler_factors(K: int, order: int = 4):
    """|b(m)|^2 denominators for one axis (numpy, host-side static)."""
    # M_n(k+1) for k = 0..n-2 at integer nodes: order 4 -> M4(1),M4(2),M4(3)
    # = 1/6, 4/6, 1/6
    mvals = np.array([1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0])
    m = np.arange(K)
    denom = np.zeros(K, np.complex128)
    for el, mv in enumerate(mvals):
        denom += mv * np.exp(2j * np.pi * m * el / K)
    b2 = 1.0 / np.maximum(np.abs(denom) ** 2, 1e-14)
    # odd-order splines at the Nyquist mode are singular; order 4 is fine,
    # but clamp anyway for robustness
    return b2


def _spread(pos, box, charges, grid):
    """B-spline charge spreading -> (Kx,Ky,Kz) grid.

    Scatter-based implementation (64 updates per atom through one
    flattened .at[].add).  Differentiable; this is the path production
    uses (forces.py calls reciprocal_energy_pme without bin_cap).  The
    binned-matmul alternative below (_spread_binned) trades the scatter
    for batched MXU matmuls and is selected via the bin_cap argument.
    """
    Kx, Ky, Kz = grid
    dims = jnp.asarray(grid)
    u = pos / jnp.asarray(box) * dims                   # (n,3) in grid units
    cell = jnp.floor(u)
    t = u - cell
    w = _bspline4(t)                                    # (n,3,4)
    base = cell.astype(jnp.int32) - 1                   # offsets j-1 .. j+2
    offs = jnp.arange(4)
    ix = jnp.mod(base[:, 0:1] + offs[None, :], Kx)      # (n,4)
    iy = jnp.mod(base[:, 1:2] + offs[None, :], Ky)
    iz = jnp.mod(base[:, 2:3] + offs[None, :], Kz)
    val = (charges[:, None, None, None]
           * w[:, 0, :, None, None] * w[:, 1, None, :, None]
           * w[:, 2, None, None, :])                    # (n,4,4,4)
    flat_idx = ((ix[:, :, None, None] * Ky + iy[:, None, :, None]) * Kz
                + iz[:, None, None, :])                 # (n,4,4,4)
    q_grid = jnp.zeros((Kx * Ky * Kz,), pos.dtype)
    q_grid = q_grid.at[flat_idx.reshape(-1)].add(val.reshape(-1))
    return q_grid.reshape(Kx, Ky, Kz)


def _plane_binned_tables(pos_z, box_z, Kz, m_cap):
    """Static-shape z-cell binning: returns (Kz, M) atom-index table (-1
    padded).  Device-side, callable under jit: sort by z-cell, then slot
    each atom at (cell, rank-within-cell) via a scatter of its index."""
    n = pos_z.shape[0]
    u = pos_z / box_z * Kz
    cz = jnp.mod(jnp.floor(u).astype(jnp.int32) - 1, Kz)   # first plane hit
    order = jnp.argsort(cz)
    cz_s = cz[order]
    # rank within cell = position - first position of this cell value
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.searchsorted(cz_s, cz_s, side="left")
    rank = idx - first
    table = jnp.full((Kz, m_cap), -1, jnp.int32)
    ok = rank < m_cap
    table = table.at[cz_s, jnp.where(ok, rank, m_cap - 1)].set(
        jnp.where(ok, order.astype(jnp.int32), table[cz_s, m_cap - 1]),
        mode="drop")
    overflow = jnp.any(~ok)
    return table, overflow


def _spread_binned(pos, box, charges, grid, bins):
    """Scatter-free spreading: atoms binned by first-touched z-plane; plane
    k = sum_{d=0..3} Wx(bin k-d)^T diag(q wz_d) Wy(bin k-d) as 4 batched
    MXU matmuls.  ``bins`` = (Kz, M) atom-index table from
    _plane_binned_tables (static shape), which MUST be built from the same
    ``pos`` passed here — the landing plane comes from the bin row, so a
    stale table places charge on wrong planes.  reciprocal_energy_pme
    derives it internally; do not cache it across steps."""
    Kx, Ky, Kz = grid
    dims = jnp.asarray(grid)
    u = pos / jnp.asarray(box) * dims
    cell = jnp.floor(u)
    t = u - cell
    w = _bspline4(t)                                      # (n,3,4)
    base = cell.astype(jnp.int32) - 1

    idx = jnp.maximum(bins, 0)                            # (Kz,M)
    mask = (bins >= 0).astype(pos.dtype)[..., None]       # (Kz,M,1)
    offs = jnp.arange(4)
    # per-binned-atom dense x/y weight rows (Kz,M,Kx)/(Kz,M,Ky): one-hot
    # expansion of the 4 nonzeros (built by comparisons, not scatter)
    bx = base[idx, 0]                                     # (Kz,M)
    by = base[idx, 1]
    gx = jnp.arange(Kx)
    gy = jnp.arange(Ky)
    wx = jnp.zeros((bins.shape[0], bins.shape[1], Kx), pos.dtype)
    wy = jnp.zeros((bins.shape[0], bins.shape[1], Ky), pos.dtype)
    for d in range(4):
        selx = (jnp.mod(bx[..., None] + d, Kx) == gx)     # (Kz,M,Kx)
        sely = (jnp.mod(by[..., None] + d, Ky) == gy)
        wx = wx + selx * w[idx, 0, d][..., None]
        wy = wy + sely * w[idx, 1, d][..., None]
    wx = wx * mask
    qwz = charges[idx][..., None] * w[idx, 2, :] * mask   # (Kz,M,4)

    planes = jnp.zeros((Kz, Kx, Ky), pos.dtype)
    for d in range(4):
        # bins whose first plane is k contribute to plane k+d with wz_d;
        # equivalently plane k receives bin k-d
        contrib = jnp.einsum("kmx,km,kmy->kxy", wx, qwz[..., d], wy,
                             preferred_element_type=jnp.float32)
        planes = planes + jnp.roll(contrib, d, axis=0)
    return jnp.transpose(planes, (1, 2, 0))               # (Kx,Ky,Kz)


def reciprocal_energy_pme(pos, box, charges, beta, grid, bin_cap=None):
    """PME reciprocal energy (differentiable -> forces via jax.grad).

    bin_cap: optional static per-z-plane atom capacity enabling the
    scatter-free binned spreading path.  The binning table is derived
    from ``pos`` inside this call so it can never be stale relative to
    the spread positions (a cached table would silently place charge on
    wrong planes); if the capacity overflows, the call falls back to the
    scatter path in-step, so the result is always exact.
    """
    Kx, Ky, Kz = grid
    if bin_cap is not None:
        bins, overflow = _plane_binned_tables(
            jax.lax.stop_gradient(pos[:, 2]), box[2], Kz, int(bin_cap))
        q_grid = jax.lax.cond(
            overflow,
            lambda p: _spread(p, box, charges, grid),
            lambda p: _spread_binned(p, box, charges, grid, bins),
            pos)
    else:
        q_grid = _spread(pos, box, charges, grid)
    F = jnp.fft.fftn(q_grid.astype(jnp.complex64))
    mx = np.fft.fftfreq(Kx) * Kx
    my = np.fft.fftfreq(Ky) * Ky
    mz = np.fft.fftfreq(Kz) * Kz
    kx = (2.0 * PI / box[0]) * mx
    ky = (2.0 * PI / box[1]) * my
    kz = (2.0 * PI / box[2]) * mz
    k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kz[None, None, :] ** 2)
    mask = k2 > 1e-10
    k2s = jnp.where(mask, k2, 1.0)
    w = jnp.where(mask, jnp.exp(-k2s / (4.0 * beta * beta)) / k2s, 0.0)
    b2 = (np.asarray(_euler_factors(Kx))[:, None, None]
          * np.asarray(_euler_factors(Ky))[None, :, None]
          * np.asarray(_euler_factors(Kz))[None, None, :])
    vol = box[0] * box[1] * box[2]
    s2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2
    return ONE_4PI_EPS0 * 2.0 * PI / vol * jnp.sum(w * b2 * s2)


def exact_sum_cost(n_atoms, kmax):
    """Estimated us/eval of the exact k-sum: HBM streaming of the (n,2AB)
    intermediate (~800 GB/s) + the (2AB,n)x(n,2C) matmul (~50 f32 TFLOP/s
    effective), x3 for the force backward (see ops/ewald.py)."""
    A = 2 * kmax[0] + 1
    B = 2 * kmax[1] + 1
    C = kmax[2] + 1
    hbm_us = n_atoms * 2 * A * B * 4 * 3 / 800e9 * 1e6
    mxu_us = n_atoms * 2 * A * B * 2 * C * 2 / 50e12 * 1e6 * 3
    return hbm_us + mxu_us


def pme_cost(n_atoms, grid):
    """Estimated us/eval of the PME path: 64 spread/interp updates per atom
    at the TPU's measured ~2 ns/scattered-row (x2 for the force backward) +
    FFT passes at ~1 Tbutterfly/s."""
    Kx, Ky, Kz = grid
    spread_us = n_atoms * 64 * 2e-3 * 2
    k3 = Kx * Ky * Kz
    fft_us = 5 * k3 * math.log2(max(k3, 2)) / 1e12 * 1e6 * 4
    return spread_us + fft_us


def choose_reciprocal(n_atoms, kmax, box, spacing=0.10):
    """'exact' or 'pme' by the cost models above (exact wins for every
    bundled reference workload; pme takes over for very large boxes)."""
    grid = choose_grid(box, spacing)
    return ("pme" if pme_cost(n_atoms, grid)
            < exact_sum_cost(n_atoms, kmax) else "exact"), grid
