"""Dense all-pairs direct-space nonbonded sweep: the shared pair math +
static-table builder, and the jnp reference/fallback path (CPU tests,
oversized or band-ineligible systems).  The TPU hot loop is the z-banded
sorted Pallas kernel in ops/pallas_pair.py, which reuses this module's
tables and (for exactness tests) matches it bit-for-bit in interpret mode.

The reference's direct space runs inside OpenMM's CUDA tile machinery
(neighbor lists + warp tiles).  On TPU, random-index gathers are the enemy:
an (N,K) Verlet-list kernel spends its time in per-element gathers, not
FLOPs.  For the reference's own workloads the cutoff sphere is a sizable
fraction of the box (bulk models: r_c = 1.2 nm vs 3.1x3.1x6.1 nm box), so a
regular sweep over z-sorted tile bands stays within ~5-8x the ideal pair
count while running at full VPU/MXU utilization with zero gathers, no
neighbor list and exact (not skin-approximated) cutoffs:

* pair LJ parameters come from a one-hot contraction over the (T,T) OPLS
  tables (handles NBFIX rows exactly; oplspsffile.py:1296-1326) — an MXU
  matmul, not a table gather;
* exclusions (1-2/1-3/1-4/Drude/lone pair, oplspsffile.py:1437-1476) are a
  *bit test*: partner offsets fit in a per-atom 31-bit forward mask (checked
  at build; distant leftovers go to a tiny residual adjustment list);
* excluded pairs contribute their reciprocal-space correction
  -qq erf(beta r)/r *in the same pass* (the erfc is already computed), so
  there is no separate exclusion-correction kernel at all;
* Ewald direct space (erfc) and LJ share one pass; per-atom forces are row
  reductions — no scatter anywhere.

Row-blocking via lax.map keeps the (B,N) intermediates bounded so XLA tiles
the whole pair sweep through VMEM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0
from ..utils.pbc import minimum_image

_SQRT_PI = 1.7724538509055159

MAX_EXCL_OFFSET = 31
# Direct-space Coulomb force cap — THE single authority for the capped
# region (the Pallas kernels in ops/pallas_pair.py import these).  The
# bare-Coulomb 1/r^3 force/r factor is clamped at r = _COUL_CAP_R =
# 0.045 nm, inside any physical contact distance and far outside f32 risk:
# legitimate chemistry never probes there (excluded/Drude pairs take the
# separate correction path, finite at r -> 0), but a zero-LJ hydrogen
# captured by a foreign Drude dipole would otherwise overflow f32 and
# poison the run with NaN instead of letting the thermostat recover.
# Both the dense and Pallas paths cap the SAME term in the SAME form:
#   f/r = qq * min(1/r^3, 1/_COUL_CAP_R^3) + [finite erfc-correction rest]
# NOTE the energy is deliberately NOT capped: below _COUL_CAP_R the
# reported energy and the applied force are inconsistent — the force
# saturates so the integrator survives, while the energy keeps its true
# value so reporters' NaN/blow-up checks still see the pathology.
_COUL_CAP_R = 0.045
_COUL_F_CAP3 = (1.0 / _COUL_CAP_R) ** 3


def build_pair_tables(n_atoms, lj_type, acoef, bcoef, exclusions,
                      lj_group=None, lj_group_allowed=None,
                      exc_idx=None, exc_qq=None, exc_c6=None, exc_c12=None,
                      charges=None, fold_exc14=True):
    """Host-side static tables for the dense kernel.

    Returns dict with:
      arows, brows: (N,T) f32   per-atom rows of the LJ tables
      onehot:       (N,T) f32   one-hot of each atom's LJ type
      excl_bits:    (N,)  i32   bit d set => atom (i+d) is excluded, d in 1..31
      residual:     (R,2) i32   excluded pairs with offset > 31 (adjust path)
      grows/gonehot: optional (N,G) for interaction-group masking
      exc14_bits:   (N,)  i32   bit d set => (i, i+d) is a kernel-handled 1-4
      a14rows/b14rows: (N,T) f32 1-4 LJ table rows (zero when absent)
      exc_term_mask: (N,XA) bool  exceptions left to the sparse term pass

    When the per-atom exception tables are passed, every *regular* 1-4
    exception — Coulomb exactly 0.5 q_i q_j and LJ consistent with a single
    per-type-pair (a14, b14) table (CHARMM rmin_14/eps_14 geometric rule,
    reference oplspsffile.py:1408-1427) — within the 31-offset window is
    folded into the pair sweep itself: the pair is already visited on the
    exclusion-correction path, so the scaled Coulomb + 1-4 LJ cost two table
    matmuls and a few VPU ops instead of a separate gather/scatter pass.
    Irregular or distant exceptions stay in the sparse term pass.
    """
    lj_type = np.asarray(lj_type)
    acoef = np.asarray(acoef, np.float64)
    bcoef = np.asarray(bcoef, np.float64)
    arows = acoef[lj_type].astype(np.float32)
    brows = bcoef[lj_type].astype(np.float32)
    T = acoef.shape[0]
    onehot = np.zeros((n_atoms, T), np.float32)
    onehot[np.arange(n_atoms), lj_type] = 1.0

    # The OPLS geometric rule makes the tables multiplicative:
    # a_ij = sa_i sa_j with sa = sqrt(diag).  NBFIX rows break that for a
    # handful of type pairs; represent those as a small per-class correction
    # so the hot loop stays elementwise (a big one-hot matmul would round-trip
    # (B,N) intermediates through HBM).
    sa = np.sqrt(np.maximum(np.diag(acoef), 0.0))
    sb = np.sqrt(np.maximum(np.diag(bcoef), 0.0))
    dA = acoef - np.outer(sa, sa)
    dB = bcoef - np.outer(sb, sb)
    scale = np.maximum(np.abs(acoef), 1e-30)
    fixed = (np.abs(dA) > 1e-6 * scale) | \
            (np.abs(dB) > 1e-6 * np.maximum(np.abs(bcoef), 1e-30))
    nbfix_types = np.where(fixed.any(axis=1))[0]
    # class 0 = "no correction"; classes 1.. = the types with NBFIX rows
    type_class = np.zeros(T, np.int32)
    type_class[nbfix_types] = np.arange(1, len(nbfix_types) + 1)
    NC = len(nbfix_types) + 1
    # per-type correction rows indexed by the partner's class
    corrA = np.zeros((T, NC), np.float32)
    corrB = np.zeros((T, NC), np.float32)
    for c, tj in enumerate(nbfix_types):
        corrA[:, c + 1] = np.where(fixed[:, tj], dA[:, tj], 0.0)
        corrB[:, c + 1] = np.where(fixed[:, tj], dB[:, tj], 0.0)
    # exactness check of the factorized representation
    recA = np.outer(sa, sa) + np.where(fixed, dA, 0.0)
    exact = np.allclose(recA, acoef, rtol=2e-6, atol=1e-30) and \
        np.allclose(np.outer(sb, sb) + np.where(fixed, dB, 0.0), bcoef,
                    rtol=2e-6, atol=1e-30)

    # built as uint32 (bit 31 is a valid offset bit), viewed as int32 for
    # the kernels — the >> k & 1 test is shift-sign agnostic
    excl_bits = np.zeros(n_atoms, np.uint32)
    residual = []
    exclusions = np.asarray(exclusions)
    for i in range(n_atoms):
        for j in exclusions[i]:
            if j < 0 or j <= i:
                continue
            d = int(j) - i
            if d <= MAX_EXCL_OFFSET:
                excl_bits[i] |= np.uint32(1 << d)
            else:
                residual.append((i, int(j)))
    excl_bits = excl_bits.view(np.int32)
    residual = (np.asarray(residual, np.int32).reshape(-1, 2)
                if residual else np.zeros((0, 2), np.int32))

    # Exclusion-closure cluster ranges for the z-banded sorted sweep: merge
    # atoms into contiguous index ranges such that no exclusion crosses a
    # range boundary.  Sorting whole ranges (stable, members keep their
    # internal order) preserves every intra-range index offset, so the
    # 31-bit exclusion masks remain valid in sorted order.
    reach = np.arange(n_atoms, dtype=np.int64)
    for i in range(n_atoms):
        for j in exclusions[i]:
            if j > i:
                reach[i] = max(reach[i], int(j))
    cluster_ref = np.zeros(n_atoms, np.int32)
    start, end = 0, -1
    for i in range(n_atoms):
        if i > end:
            start = i
        end = max(end, int(reach[i]))
        cluster_ref[i] = start

    # ---- kernel-handled 1-4 exceptions ----
    exc14_bits = np.zeros(n_atoms, np.uint32)
    a14 = np.zeros((T, T), np.float64)
    b14 = np.zeros((T, T), np.float64)
    exc_term_mask = None
    if exc_idx is not None and np.asarray(exc_idx).size:
        exc_idx = np.asarray(exc_idx)
        exc_qq = np.asarray(exc_qq, np.float64)
        exc_c6 = np.asarray(exc_c6, np.float64)
        exc_c12 = np.asarray(exc_c12, np.float64)
        q = np.asarray(charges, np.float64)
        exc_term_mask = exc_idx >= 0
        seen = np.zeros((T, T), bool)
        for i in range(n_atoms):
            for k in range(exc_idx.shape[1]):
                j = int(exc_idx[i, k])
                if j < 0 or j <= i:
                    continue
                qq, c6, c12 = exc_qq[i, k], exc_c6[i, k], exc_c12[i, k]
                if qq == 0.0 and c6 == 0.0 and c12 == 0.0:
                    # pure exclusion (lone-pair / Drude attachments): the
                    # exclusion bitmask already covers it — drop the term
                    kk = np.where(exc_idx[j] == i)[0]
                    exc_term_mask[i, k] = False
                    exc_term_mask[j, kk] = False
                    continue
                qq_reg = 0.5 * ONE_4PI_EPS0 * q[i] * q[j]
                regular = fold_exc14 and \
                    abs(qq - qq_reg) <= 1e-5 * max(abs(qq_reg), 1e-6)
                ti, tj = int(lj_type[i]), int(lj_type[j])
                av, bv = np.sqrt(max(c12, 0.0)), c6
                if regular and seen[ti, tj]:
                    regular = (abs(a14[ti, tj] - av)
                               <= 1e-5 * max(a14[ti, tj], 1e-12)
                               and abs(b14[ti, tj] - bv)
                               <= 1e-5 * max(abs(b14[ti, tj]), 1e-12))
                d = int(j) - i
                if regular and 1 <= d <= MAX_EXCL_OFFSET:
                    if not seen[ti, tj]:
                        a14[ti, tj] = av
                        a14[tj, ti] = av
                        b14[ti, tj] = bv
                        b14[tj, ti] = bv
                        seen[ti, tj] = seen[tj, ti] = True
                    exc14_bits[i] |= np.uint32(1 << d)
                    kk = np.where(exc_idx[j] == i)[0]
                    exc_term_mask[i, k] = False
                    exc_term_mask[j, kk] = False
    exc14_bits = exc14_bits.view(np.int32)

    out = dict(arows=arows, brows=brows, onehot=onehot,
               excl_bits=excl_bits, residual=residual,
               cluster_ref=cluster_ref,
               exc14_bits=exc14_bits,
               a14rows=a14[lj_type].astype(np.float32),
               b14rows=b14[lj_type].astype(np.float32),
               exc_term_mask=exc_term_mask,
               has_exc14=bool((exc14_bits != 0).any()),
               grows=None, gonehot=None,
               factorized=bool(exact),
               sa=sa[lj_type].astype(np.float32),
               sb=sb[lj_type].astype(np.float32),
               cls=type_class[lj_type],
               corrA=corrA[lj_type], corrB=corrB[lj_type])
    if lj_group is not None and lj_group_allowed is not None \
            and np.asarray(lj_group_allowed).shape[0] > 1:
        g = np.asarray(lj_group)
        allowed = np.asarray(lj_group_allowed, np.float32)
        G = allowed.shape[0]
        out["grows"] = allowed[g]                      # (N,G)
        goh = np.zeros((n_atoms, G), np.float32)
        goh[np.arange(n_atoms), g] = 1.0
        out["gonehot"] = goh
    # static per-residual-pair coefficients: types and groups never change,
    # so the adjust path needs no (R,T) table gathers at runtime — at EDL
    # scale (R = 13,448 from the MoS2 lattice + mirrored image exclusions)
    # those gathers + one-hot reduces measured ~1.3 ms/step on device
    if residual.shape[0]:
        ti = lj_type[residual[:, 0]]
        tj = lj_type[residual[:, 1]]
        res_a = acoef[ti, tj].astype(np.float32)
        res_b = bcoef[ti, tj].astype(np.float32)
        if out["grows"] is not None:
            ga = np.asarray(lj_group_allowed, np.float32)[
                np.asarray(lj_group)[residual[:, 0]],
                np.asarray(lj_group)[residual[:, 1]]]
            res_a = res_a * ga
            res_b = res_b * ga
        out["residual_a"] = res_a
        out["residual_b"] = res_b
        if charges is not None:
            # f32 operation order mirrors the old runtime expression
            # (ONE_4PI_EPS0 * q_i) * q_j so results stay bit-identical
            q32 = np.asarray(charges, np.float32)
            out["residual_qq"] = ((np.float32(ONE_4PI_EPS0)
                                   * q32[residual[:, 0]])
                                  * q32[residual[:, 1]])
        # atom-major incidence for the residual force accumulation: the
        # involved-atom set is tiny (at EDL, ~2.5k electrode atoms for
        # R = 13,448 pairs), so gathering each atom's incident pair forces
        # and ONE compact scatter replaces two full-list scatter-adds
        # (two ~140 us scatters at EDL; see pallas_pair.residual_adjustment)
        incid = {}
        for p, (pi, pj) in enumerate(np.asarray(residual)):
            incid.setdefault(int(pi), []).append((p, 1.0))
            incid.setdefault(int(pj), []).append((p, -1.0))
        atoms = np.fromiter(sorted(incid), np.int32)
        amax = max(len(v) for v in incid.values())
        res_incid = np.full((atoms.size, amax), -1, np.int32)
        res_sign = np.zeros((atoms.size, amax), np.float32)
        for r_, at in enumerate(atoms):
            for k, (p, sgn) in enumerate(incid[int(at)]):
                res_incid[r_, k] = p
                res_sign[r_, k] = sgn
        out["res_atoms"] = atoms
        out["res_incid"] = res_incid
        out["res_sign"] = res_sign
    return out


def lj_switch(e_lj, f_lj, r, inv_r, r_switch, r_cutoff):
    """OpenMM switching function on the LJ terms (NonbondedForce /
    CustomNonbondedForce semantics, oplspsffile.py:1201-1211, 1335-1345):
    E *= S(r), S = 1 - 10x^3 + 15x^4 - 6x^5, x = (r-rs)/(rc-rs) clipped to
    [0,1]; the force scalar (f = -dE/dr / r convention) becomes
    S*f - E*dS/dr/r.  r_switch is static; 0 disables at trace time.
    Exceptions (1-4) stay unswitched, as in OpenMM."""
    if not r_switch:
        return e_lj, f_lj
    inv_w = 1.0 / (r_cutoff - r_switch)
    x = jnp.clip((r - r_switch) * inv_w, 0.0, 1.0)
    x2 = x * x
    s = 1.0 + x * x2 * (-10.0 + x * (15.0 - 6.0 * x))
    ds = x2 * (-30.0 + x * (60.0 - 30.0 * x)) * inv_w
    return e_lj * s, f_lj * s - e_lj * ds * inv_r


def _pair_terms(r2, qq, a, b, beta, r_cutoff, direct_mask, corr_mask,
                exc14_mask=None, a14=None, b14=None, r_switch=0.0):
    """Shared LJ + Ewald-direct + exclusion-correction math.

    direct pairs:   E = a^2/r^12 - b/r^6 + qq erfc(beta r)/r
    excluded pairs: E = -qq erf(beta r)/r   (reciprocal-space correction;
                    finite at r -> 0, which Drude pairs approach)
    1-4 exception pairs (kernel-handled, see build_pair_tables): additionally
                    E = 0.5 qq/r + a14^2/r^12 - b14/r^6
    Returns (e_lj, e_coul, e_corr, e14_coul, e14_lj, f_scalar).
    """
    in_range = direct_mask & (r2 < r_cutoff * r_cutoff)
    r2s = jnp.maximum(r2, 1e-10)
    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r
    r = r2s * inv_r
    # separate LJ floor: keeps r^-12 finite in f32 so zero-LJ coincident
    # particles (e.g. image charges at t=0) give 0 * finite, not 0 * inf
    inv_r2_lj = 1.0 / jnp.maximum(r2, 1e-6)
    inv_r6 = inv_r2_lj * inv_r2_lj * inv_r2_lj
    inv_r12 = inv_r6 * inv_r6
    e_lj = a * a * inv_r12 - b * inv_r6
    f_lj = (12.0 * a * a * inv_r12 - 6.0 * b * inv_r6) * inv_r2_lj
    e_lj, f_lj = lj_switch(e_lj, f_lj, r, inv_r, r_switch, r_cutoff)
    br = beta * r
    # erfc via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7), sharing its exp
    # with the Gaussian force term — one transcendental per pair instead of
    # the two inside lax.erfc + exp.
    expm = jnp.exp(-br * br)
    t = 1.0 / (1.0 + 0.3275911 * br)
    erfc_br = (t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))) * expm
    gauss = (2.0 * beta / _SQRT_PI) * expm
    e_coul = qq * erfc_br * inv_r
    erf_inv_r = (1.0 - erfc_br) * inv_r
    e_corr = -qq * erf_inv_r
    f_corr = -qq * (erf_inv_r - gauss) * inv_r2
    # capped bare-Coulomb 1/r^3 plus the finite erfc-correction remainder
    # (== f_corr); see _COUL_CAP_R above for the cap contract shared with
    # the Pallas paths
    f_coul = qq * jnp.minimum(inv_r * inv_r2, _COUL_F_CAP3) + f_corr
    zero = jnp.zeros_like(e_lj)
    f_s = jnp.where(in_range, f_lj + f_coul, zero) \
        + jnp.where(corr_mask, f_corr, zero)
    if exc14_mask is None:
        e14_c = e14_l = zero
    else:
        e14_c = 0.5 * qq * inv_r
        e14_12 = a14 * a14 * inv_r12
        e14_6 = b14 * inv_r6
        e14_l = e14_12 - e14_6
        f14 = (e14_c + 12.0 * e14_12 - 6.0 * e14_6) * inv_r2
        e14_c = jnp.where(exc14_mask, e14_c, zero)
        e14_l = jnp.where(exc14_mask, e14_l, zero)
        f_s = f_s + jnp.where(exc14_mask, f14, zero)
    return (jnp.where(in_range, e_lj, zero),
            jnp.where(in_range, e_coul, zero),
            jnp.where(corr_mask, e_corr, zero),
            e14_c, e14_l, f_s)


def direct_space_dense(pos, box, charges, tables, beta, r_cutoff,
                       row_block: int = 1024, lj_mode: str = "einsum",
                       r_switch: float = 0.0):
    """All-pairs LJ + Ewald-direct + exclusion-correction sweep.

    lj_mode: "einsum" computes pair LJ parameters by one-hot contraction
    over the type tables (measured faster on TPU); "factorized" uses the
    sqrt-product + per-class NBFIX correction (useful reference/fallback).
    Returns (E_lj, E_coul_direct, E_excl_corr, E_exc14_coul, E_exc14_lj, F).
    """
    n = pos.shape[0]
    arows = jnp.asarray(tables["arows"])
    brows = jnp.asarray(tables["brows"])
    onehot = jnp.asarray(tables["onehot"])
    excl_bits = jnp.asarray(tables["excl_bits"])
    has14 = tables.get("has_exc14", False)
    exc14_bits = jnp.asarray(tables["exc14_bits"]) if has14 else None
    grows = tables["grows"]
    gonehot = tables["gonehot"]
    q = charges

    B = min(row_block, n)
    n_pad = ((n + B - 1) // B) * B
    pad = n_pad - n

    def pad_rows(x, fill=0.0):
        if pad == 0:
            return x
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    pos_p = pad_rows(pos)
    q_p = pad_rows(q)
    excl_p = pad_rows(excl_bits)
    col_id = jnp.arange(n, dtype=jnp.int32)[None, :]
    row_id_all = jnp.arange(n_pad, dtype=jnp.int32)

    excl14_p = pad_rows(exc14_bits) if has14 else None
    factorized = tables["factorized"] and lj_mode == "factorized"
    if factorized:
        sa_all = jnp.asarray(tables["sa"])
        sb_all = jnp.asarray(tables["sb"])
        cls_all = jnp.asarray(tables["cls"])
        NC = tables["corrA"].shape[1]
        # row data = (sa, sb, corrA row, corrB row) stacked along axis 1
        ab_rows = np.concatenate(
            [tables["sa"][:, None], tables["sb"][:, None],
             tables["corrA"], tables["corrB"]], axis=1).astype(np.float32)
    else:
        ab_rows = np.concatenate([tables["arows"], tables["brows"]],
                                 axis=1).astype(np.float32)
        if has14:
            ab_rows = np.concatenate(
                [ab_rows, tables["a14rows"], tables["b14rows"]],
                axis=1).astype(np.float32)

    def block(args):
        p_blk, q_blk, a_blk, g_blk, eb_blk, eb14_blk, rid = args
        dr = minimum_image(p_blk[:, None, :] - pos[None, :, :], box)  # (B,N,3)
        r2 = jnp.sum(dr * dr, -1)
        delta = col_id - rid[:, None]                                 # (B,N)
        # exclusion bit test, both directions
        dfwd = jnp.clip(delta, 1, MAX_EXCL_OFFSET)
        dbwd = jnp.clip(-delta, 1, MAX_EXCL_OFFSET)
        excl = (((eb_blk[:, None] >> dfwd) & 1) > 0) & (delta >= 1) & \
               (delta <= MAX_EXCL_OFFSET)
        excl |= (((excl_bits[None, :] >> dbwd) & 1) > 0) & (delta <= -1) & \
                (delta >= -MAX_EXCL_OFFSET)
        alive = (delta != 0) & (rid[:, None] < n)
        exc14 = None
        if has14:
            exc14 = (((eb14_blk[:, None] >> dfwd) & 1) > 0) & (delta >= 1) \
                & (delta <= MAX_EXCL_OFFSET)
            exc14 |= (((exc14_bits[None, :] >> dbwd) & 1) > 0) \
                & (delta <= -1) & (delta >= -MAX_EXCL_OFFSET)
            exc14 = exc14 & alive
        if factorized:
            # geometric rule is multiplicative; NBFIX rows add a per-class
            # correction — all elementwise, fuses into the pair sweep
            a = a_blk[:, 0:1] * sa_all[None, :]
            b = a_blk[:, 1:2] * sb_all[None, :]
            if NC > 1:
                ca = jnp.zeros_like(a)
                cb = jnp.zeros_like(b)
                for k in range(1, NC):
                    hit = cls_all[None, :] == k
                    ca = jnp.where(hit, a_blk[:, 2 + k:3 + k], ca)
                    cb = jnp.where(hit, a_blk[:, 2 + NC + k:3 + NC + k], cb)
                a = a + ca
                b = b + cb
        else:
            T = onehot.shape[1]
            a = jnp.einsum("bt,nt->bn", a_blk[:, :T], onehot)
            b = jnp.einsum("bt,nt->bn", a_blk[:, T:2 * T], onehot)
        if grows is not None:
            allowed = jnp.einsum("bg,ng->bn", g_blk, jnp.asarray(gonehot))
            a = a * allowed
            b = b * allowed
        qq = ONE_4PI_EPS0 * q_blk[:, None] * q[None, :]
        if has14:
            T = onehot.shape[1]
            a14 = jnp.einsum("bt,nt->bn",
                             a_blk[:, 2 * T:3 * T], onehot)
            b14 = jnp.einsum("bt,nt->bn", a_blk[:, 3 * T:], onehot)
        else:
            a14 = b14 = None
        e_lj, e_coul, e_corr, e14c, e14l, f_s = _pair_terms(
            r2, qq, a, b, beta, r_cutoff,
            direct_mask=alive & ~excl, corr_mask=alive & excl,
            exc14_mask=exc14, a14=a14, b14=b14, r_switch=r_switch)
        forces = jnp.sum(f_s[..., None] * dr, axis=1)                 # (B,3)
        return (forces, jnp.sum(e_lj), jnp.sum(e_coul), jnp.sum(e_corr),
                jnp.sum(e14c), jnp.sum(e14l))

    ab_p = pad_rows(jnp.asarray(ab_rows))                             # (Np,W)
    if grows is not None:
        g_p = pad_rows(jnp.asarray(grows))
    else:
        g_p = jnp.zeros((n_pad, 1), jnp.float32)
    e14_p = (excl14_p if has14 else jnp.zeros((n_pad,), jnp.int32))
    f_blocks, e_lj_b, e_coul_b, e_corr_b, e14c_b, e14l_b = jax.lax.map(
        block, (pos_p.reshape(-1, B, 3), q_p.reshape(-1, B),
                ab_p.reshape(-1, B, ab_p.shape[-1]),
                g_p.reshape(-1, B, g_p.shape[-1]),
                excl_p.reshape(-1, B), e14_p.reshape(-1, B),
                row_id_all.reshape(-1, B)))
    forces = f_blocks.reshape(n_pad, 3)[:n]
    e_lj = 0.5 * jnp.sum(e_lj_b)
    e_coul = 0.5 * jnp.sum(e_coul_b)
    e_corr = 0.5 * jnp.sum(e_corr_b)
    e14_coul = 0.5 * jnp.sum(e14c_b)
    e14_lj = 0.5 * jnp.sum(e14l_b)

    # residual excluded pairs (index offset > 31): the sweep treated them as
    # plain direct pairs; adjust to the excluded-pair form with identical
    # formulas so the cancellation is exact to rounding.
    res = tables["residual"]
    if res.shape[0] > 0:
        i, j = res[:, 0], res[:, 1]
        dr = minimum_image(pos[i] - pos[j], box)
        r2 = jnp.sum(dr * dr, -1)
        a = jnp.sum(arows[i] * onehot[j], -1)
        b = jnp.sum(brows[i] * onehot[j], -1)
        if grows is not None:
            allowed = jnp.sum(jnp.asarray(grows)[i]
                              * jnp.asarray(gonehot)[j], -1)
            a = a * allowed
            b = b * allowed
        qq = ONE_4PI_EPS0 * q[i] * q[j]
        ones = jnp.ones(r2.shape, bool)
        _, _, e_corr_r, _, _, f_corr_only = _pair_terms(
            r2, qq, a, b, beta, r_cutoff, direct_mask=jnp.zeros_like(ones),
            corr_mask=ones)
        e_lj_d, e_coul_d, _, _, _, f_direct_only = _pair_terms(
            r2, qq, a, b, beta, r_cutoff, direct_mask=ones,
            corr_mask=jnp.zeros_like(ones), r_switch=r_switch)
        e_lj = e_lj - jnp.sum(e_lj_d)
        e_coul = e_coul - jnp.sum(e_coul_d)
        e_corr = e_corr + jnp.sum(e_corr_r)
        f_adj = (f_corr_only - f_direct_only)[:, None] * dr
        forces = forces.at[i].add(f_adj).at[j].add(-f_adj)
    return e_lj, e_coul, e_corr, e14_coul, e14_lj, forces
