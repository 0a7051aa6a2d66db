"""Fused exact-k Ewald reciprocal sum as Pallas TPU kernels.

The jnp formulation (ops/ewald.py) is exact and MXU-friendly but materializes
(N, 2·A·B) phase matrices in HBM — at the 19.5k-atom bench config that is
~26 MB per pass, ~100 MB/step including the autodiff backward, measured as a
~0.2 ms cluster of gather/dot/cos fusions in the device profile (the largest
single piece of the step's "linear-N tail").

Here the k grid is FLATTENED to the half-space list of K vectors and the
phase angles theta[i,k] = k·r_i are recomputed on the fly inside VMEM, one
(tile × K) block at a time — nothing of size (N, K) ever touches HBM:

  pass 1 (energy):  S_re(k) = sum_i q_i cos theta_ik,  S_im likewise,
                    accumulated across the atom-tile grid into one (8, K)
                    output block; E = c0 * sum_k w_k |S(k)|^2 in plain jnp.
  pass 2 (forces):  F_i = -sum_k q_i (a_k cos theta_ik - b_k sin theta_ik) k
                    with a_k = 2 c0 w_k S_im, b_k = 2 c0 w_k S_re — per-tile
                    elementwise + three lane reductions, again no HBM blowup.

Both passes are pure VPU work (broadcast multiply-adds + transcendentals);
the trig is recomputed in pass 2 rather than saved, trading ~13M cheap
transcendentals for the ~50 MB round-trip XLA's saved-residual autodiff pays.

Exposed as ``reciprocal_energy_fused``, a drop-in for
``ewald.reciprocal_energy`` wrapped in a jax.custom_vjp so jax.grad(E)(pos)
dispatches pass 2.  CAVEAT: the custom backward returns ZERO cotangents for
box and charges (the engine's force path differentiates positions only —
forces.py:_smooth_energy); do not use this path for analytic box/charge
derivatives.

Reference behavior being replaced: OpenMM's reciprocal PME (the plugin
delegates all forces to OpenMM, SURVEY.md §0); numerics match ops/ewald.py
(same half-space weighting) to float32 roundoff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import ONE_4PI_EPS0, PI

# When True, ForceEvaluator's recip="auto" resolves "exact" to the fused
# kernel on non-CPU single-chip backends.  Round-5 device A/B
# (results/ab_matrix_r5.log): the k-tiled kernel compiles and runs at any
# kmax (round 4's VMEM blowout is fixed), but it LOSES to the factorized
# exact-k matmul everywhere — 8.43 vs 1.96 ms/step on the 19.5k bulk
# bench — because flattening the k grid forfeits the A*B x C phase
# factorization: this kernel evaluates ~2NK transcendentals per pass
# where the matmul path needs only ~2N(AB+C) plus one MXU contraction
# (22x fewer at bulk kmax).  The HBM-intermediate problem it was built
# for is solved instead by the atom-chunked remat scan in
# ewald.reciprocal_energy(chunk=...).  Keep False; the kernel stays as a
# reference implementation of the flattened-K formulation.
FUSED_AUTO = False


def _half_space_modes(kmax) -> np.ndarray:
    """Integer mode triples (K, 3) covering the kz >= 0 half space with the
    kz = 0 plane reduced to its canonical (ky > 0) | (ky == 0 & kx > 0)
    half — the same set ops/ewald.py keeps with weight 2 (conjugate
    symmetry S(-k) = S*(k))."""
    nx = np.arange(-kmax[0], kmax[0] + 1)
    ny = np.arange(-kmax[1], kmax[1] + 1)
    nz = np.arange(0, kmax[2] + 1)
    gx, gy, gz = np.meshgrid(nx, ny, nz, indexing="ij")
    keep = gz > 0
    keep |= (gz == 0) & ((gy > 0) | ((gy == 0) & (gx > 0)))
    modes = np.stack([gx[keep], gy[keep], gz[keep]], axis=1)
    return np.ascontiguousarray(modes.astype(np.float32))


def _structure_kernel(pos_ref, q_ref, kvec_ref, out_ref):
    """Accumulate S_re/S_im rows of one (8, kt) k-tile across atom tiles.

    Grid is (nk, na) — the atom reduction is the innermost dim so the
    output block (indexed by the k-tile only) stays resident in VMEM
    across its accumulation run."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    theta = (pos_ref[:, 0:1] * kvec_ref[0:1, :]
             + pos_ref[:, 1:2] * kvec_ref[1:2, :]
             + pos_ref[:, 2:3] * kvec_ref[2:3, :])          # (T, kt)
    q = q_ref[:, 0:1]
    s_re = jnp.sum(q * jnp.cos(theta), axis=0, keepdims=True)
    s_im = jnp.sum(q * jnp.sin(theta), axis=0, keepdims=True)
    out_ref[0:1, :] += s_re
    out_ref[1:2, :] += s_im


def _force_kernel(pos_ref, q_ref, kvec_ref, ab_ref, f_ref):
    """Per-atom reciprocal force: ab_ref rows are (a_k, b_k) = 2 c0 w_k
    (S_im, S_re); F_i = -q_i * sum_k (a_k cos - b_k sin)(theta_ik) k.

    Grid is (na, nk) — the k reduction is the innermost dim so the force
    block (indexed by the atom tile only) accumulates in VMEM, and the
    (T, kt) theta temporaries stay bounded regardless of the total K
    (at EDL kmax the unsplit K ~ 12k rows blew the 16 MB scoped-vmem
    limit; see ROUND4_NOTES 'exact_fused crashes on TPU')."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        f_ref[:, :] = jnp.zeros_like(f_ref)

    theta = (pos_ref[:, 0:1] * kvec_ref[0:1, :]
             + pos_ref[:, 1:2] * kvec_ref[1:2, :]
             + pos_ref[:, 2:3] * kvec_ref[2:3, :])          # (T, kt)
    g = q_ref[:, 0:1] * (ab_ref[0:1, :] * jnp.cos(theta)
                         - ab_ref[1:2, :] * jnp.sin(theta))  # dE/dtheta
    f_ref[:, 0:1] += -jnp.sum(g * kvec_ref[0:1, :], axis=1, keepdims=True)
    f_ref[:, 1:2] += -jnp.sum(g * kvec_ref[1:2, :], axis=1, keepdims=True)
    f_ref[:, 2:3] += -jnp.sum(g * kvec_ref[2:3, :], axis=1, keepdims=True)


def _prep(pos, box, charges, beta, kmax, ts):
    """Shared padding + k-vector/weight setup (all jnp; K stays tiny)."""
    modes = _half_space_modes(kmax)                          # (K, 3) static
    k_real = modes.shape[0]
    # k tile: single tile when small (bulk kmax ~ 340 modes), else 1024-lane
    # tiles so the per-tile (ts, kt) theta temporaries stay ~1 MB each and
    # the kernels fit scoped VMEM at any kmax (EDL: K ~ 11.9k).
    if k_real <= 2048:
        kt = max(128, -(-k_real // 128) * 128)
    else:
        kt = 1024
    kp = -(-k_real // kt) * kt
    n = pos.shape[0]
    n_pad = -(-n // ts) * ts
    posp = jnp.pad(pos.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    qp = jnp.pad(jnp.asarray(charges, jnp.float32), (0, n_pad - n))[:, None]
    two_pi = jnp.asarray(2.0 * PI, jnp.float32)
    kvec = (two_pi * modes.T / jnp.asarray(box, jnp.float32)[:, None])
    kvec = jnp.pad(kvec, ((0, 0), (0, kp - k_real)))         # (3, Kp)
    k2 = jnp.sum(kvec * kvec, axis=0)                        # (Kp,)
    k2s = jnp.where(k2 > 1e-10, k2, 1.0)
    w = jnp.where(k2 > 1e-10,
                  2.0 * jnp.exp(-k2s / (4.0 * beta * beta)) / k2s, 0.0)
    vol = box[0] * box[1] * box[2]
    c0 = ONE_4PI_EPS0 * 2.0 * PI / vol
    return posp, qp, kvec, w, c0, n_pad, kp, kt


def _structure_factor(posp, qp, kvec, ts, kp, kt, interpret):
    grid = (kp // kt, posp.shape[0] // ts)                   # k major, atoms minor
    out = pl.pallas_call(
        _structure_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, 3), lambda k, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda k, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kt), lambda k, i: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, kt), lambda k, i: (0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, kp), jnp.float32),
        interpret=interpret,
    )(posp, qp, kvec)
    return out[0, :], out[1, :]


def _forces(posp, qp, kvec, ab, ts, kp, kt, n, interpret):
    grid = (posp.shape[0] // ts, kp // kt)                   # atoms major, k minor
    f = pl.pallas_call(
        _force_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ts, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((posp.shape[0], 8), jnp.float32),
        interpret=interpret,
    )(posp, qp, kvec, ab)
    return f[:n, :3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def reciprocal_energy_fused(pos, box, charges, beta, kmax,
                            ts: int = 256, interpret: bool = False):
    """Exact k-space Ewald energy, Pallas-fused (see module docstring).

    Matches ewald.reciprocal_energy(pos, box, charges, beta, kmax) to f32
    roundoff; jax.grad w.r.t. ``pos`` runs the fused force kernel.  The
    custom backward returns zero cotangents for box/charges.
    """
    posp, qp, kvec, w, c0, n_pad, kp, kt = _prep(pos, box, charges, beta,
                                                 kmax, ts)
    s_re, s_im = _structure_factor(posp, qp, kvec, ts, kp, kt, interpret)
    return c0 * jnp.sum(w * (s_re * s_re + s_im * s_im))


def _fused_fwd(pos, box, charges, beta, kmax, ts, interpret):
    posp, qp, kvec, w, c0, n_pad, kp, kt = _prep(pos, box, charges, beta,
                                                 kmax, ts)
    s_re, s_im = _structure_factor(posp, qp, kvec, ts, kp, kt, interpret)
    e = c0 * jnp.sum(w * (s_re * s_re + s_im * s_im))
    return e, (pos, box, charges, s_re, s_im)


def _fused_bwd(beta, kmax, ts, interpret, res, g):
    pos, box, charges, s_re, s_im = res
    posp, qp, kvec, w, c0, n_pad, kp, kt = _prep(pos, box, charges, beta,
                                                 kmax, ts)
    # dE/dtheta_ik = 2 c0 w_k (S_im cos - S_re sin) q_i; rows: (a_k, b_k)
    a = 2.0 * c0 * w * s_im
    b = 2.0 * c0 * w * s_re
    ab = jnp.zeros((8, kp), jnp.float32)
    ab = ab.at[0, :].set(a).at[1, :].set(b)
    dpos = -_forces(posp, qp, kvec, ab, ts, kp, kt, pos.shape[0], interpret)
    return (g * dpos, jnp.zeros_like(box), jnp.zeros_like(charges))


reciprocal_energy_fused.defvjp(_fused_fwd, _fused_bwd)
