"""Nonbonded interactions: direct-space LJ + Ewald real-space, exclusion
corrections, 1-4 exceptions, dispersion correction, Tang-Toennies damping.

Physics matches the reference force-field builder:

* LJ uses the OPLS geometric combination rule in tabulated form
  ``E = (a/r^6)^2 - b/r^6`` with per-type-pair a/b tables
  (oplspsffile.py:1303-1326, including NBFIX overrides 1296-1310).
* Coulomb is Ewald-split: erfc(beta r)/r direct part here, reciprocal part in
  ops/ewald.py, with excluded pairs' reciprocal contribution subtracted via
  -qq*erf(beta r)/r (the standard OpenMM exclusion treatment).
* 1-4 exceptions add 0.5*q1*q4/r Coulomb and geometric-rule LJ from the
  *_14 parameters (oplspsffile.py:1415-1427).
* The LJ long-range dispersion correction mirrors
  ``setUseLongRangeCorrection(True)`` (oplspsffile.py:1311).
* Tang-Toennies CLPol damping between H-bond donors and Drude dipoles follows
  force.py:230-282.

TPU design: the hot pair sweep lives in ops/allpairs.py (dense) and
ops/pallas_pair.py (banded Pallas kernel); this module holds the shared
smaller terms, differentiated by jax.grad where analytic forces are not
hand-written.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0, PI
from ..utils.pbc import minimum_image

_SQRT_PI = 1.7724538509055159
_EPS = 1e-12


def ewald_self_energy(charges, beta, box):
    """Point self-energy and neutralizing-background terms of the Ewald sum."""
    sum_q2 = jnp.sum(charges * charges)
    sum_q = jnp.sum(charges)
    vol = box[0] * box[1] * box[2]
    e_self = -ONE_4PI_EPS0 * beta / _SQRT_PI * sum_q2
    e_background = -ONE_4PI_EPS0 * PI / (2.0 * beta * beta * vol) * sum_q * sum_q
    return e_self + e_background


def dispersion_correction(box, coef_a2, coef_b, r_cutoff, r_switch=0.0):
    """LJ long-range correction: E = 2 pi/V * (A2 I12 - B I6) with
    A2 = sum_types Ni Nj a_ij^2, B = sum_types Ni Nj b_ij (precomputed),
    I12 = int_rc^inf r^-10 dr, I6 = int_rc^inf r^-4 dr.
    Matches OpenMM's numeric LRC for the tabulated OPLS form; with a
    switching distance, the energy removed on [rs, rc] is added back
    (OpenMM computes the same correction numerically):
    I += int_rs^rc (1 - S(r)) r^{2-k} dr."""
    vol = box[0] * box[1] * box[2]
    rc3 = r_cutoff ** 3
    rc9 = rc3 ** 3
    i12 = 1.0 / (9.0 * rc9)
    i6 = 1.0 / (3.0 * rc3)
    if r_switch:
        # static quadrature at build/trace time (host floats)
        r = np.linspace(float(r_switch), float(r_cutoff), 2049)
        x = (r - float(r_switch)) / (float(r_cutoff) - float(r_switch))
        one_m_s = x ** 3 * (10.0 - 15.0 * x + 6.0 * x * x)
        i12 = i12 + float(np.trapezoid(one_m_s * r ** -10, r))
        i6 = i6 + float(np.trapezoid(one_m_s * r ** -4, r))
    return 2.0 * PI / vol * (coef_a2 * i12 - coef_b * i6)


def tt_damping_energy(pos, box, donors, tt_charges, dipole_mask, exclusions,
                      b, r_cutoff):
    """CLPol Tang-Toennies Coulomb damping (force.py:230-282):
    E = -C q1 q2 / r * exp(-br) * (1 + br + (br)^2/2 + (br)^3/6 + (br)^4/24)
    between donor particles and all dipole sites (parents use -q_drude),
    respecting the NonbondedForce exclusions.  Dense donors x atoms — the
    donor set is small.  Differentiated by jax.grad for forces.
    """
    if donors.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    donors = jnp.asarray(donors)
    tt_charges = jnp.asarray(tt_charges)
    dipole_mask = jnp.asarray(dipole_mask)
    exclusions = jnp.asarray(exclusions)
    dpos = pos[donors]                             # (Nd,3)
    dr = minimum_image(dpos[:, None, :] - pos[None, :, :], box)
    r2 = jnp.maximum(jnp.sum(dr * dr, -1), 1e-10)
    r = jnp.sqrt(r2)
    # pair validity: target is a dipole site, within cutoff, not excluded,
    # not the donor itself
    excl_d = exclusions[donors]                    # (Nd,E)
    tgt = jnp.arange(pos.shape[0])[None, :]
    is_excl = jnp.any(excl_d[:, :, None] == tgt[:, None, :], axis=1)
    valid = (dipole_mask[None, :] & (r2 < r_cutoff * r_cutoff)
             & ~is_excl & (donors[:, None] != tgt))
    qq = tt_charges[donors][:, None] * tt_charges[None, :]
    br = b * r
    gamma = 1.0 + br * (1.0 + br * (0.5 + br * (1.0 / 6.0 + br / 24.0)))
    e = -ONE_4PI_EPS0 * qq / r * jnp.exp(-br) * gamma
    return jnp.sum(jnp.where(valid, e, 0.0))


def nbthole_energy(pos, box, nbt_idx, nbt_alpha, nbt_coef, charges,
                   exclusions, r_cutoff):
    """NBTHOLE screened dipole-dipole interaction
    (reference oplspsffile.py:1350-1405):

        E = -C q1 q2 (1 + s r / 2) exp(-s r) / r
        s = coef(t1, t2) * alpha1^(-1/6) * alpha2^(-1/6) * 10   [1/nm]

    over pairs of atoms in *different* NBTHOLE type groups whose coefficient
    is nonzero (the reference's interaction groups), respecting the
    NonbondedForce exclusions, with a plain CutoffPeriodic truncation.
    The active-site subset is static, so the pair sweep is dense (Na, Na).
    """
    import numpy as np
    active = np.where(np.asarray(nbt_idx) > 0)[0]
    if active.size == 0:
        return jnp.zeros((), pos.dtype)
    t = np.asarray(nbt_idx)[active]
    alpha = np.asarray(nbt_alpha)[active]
    coef = np.asarray(nbt_coef, np.float64)
    screen = (coef[t[:, None], t[None, :]]
              * alpha[:, None] * alpha[None, :] * 10.0).astype(np.float32)
    pair_ok = (screen != 0.0) & (t[:, None] != t[None, :])
    # exclusion mask over the active subset (host-side, static)
    exl = np.asarray(exclusions)
    pos_in_active = -np.ones(exl.shape[0] if exl.size else 0, np.int64)
    pos_in_active[active] = np.arange(active.size)
    excl_m = np.zeros((active.size, active.size), bool)
    for row, i in enumerate(active):
        for j in exl[i]:
            if j >= 0 and pos_in_active[j] >= 0:
                excl_m[row, pos_in_active[j]] = True
    pair_ok &= ~excl_m
    pair_ok &= ~np.eye(active.size, dtype=bool)

    p = pos[active]
    q = jnp.asarray(np.asarray(charges)[active])
    dr = minimum_image(p[:, None, :] - p[None, :, :], box)
    r2 = jnp.maximum(jnp.sum(dr * dr, -1), 1e-12)
    r = jnp.sqrt(r2)
    mask = jnp.asarray(pair_ok) & (r2 < r_cutoff * r_cutoff)
    sr = jnp.asarray(screen) * r
    e = (-ONE_4PI_EPS0 * q[:, None] * q[None, :]
         * (1.0 + 0.5 * sr) * jnp.exp(-sr) / r)
    return 0.5 * jnp.sum(jnp.where(mask, e, 0.0))
