"""The per-step physics of the VV/middle integrator as pure functions.

Each function is the TPU-native counterpart of one reference CUDA kernel
(SURVEY.md section 2.3); together they compose into a single fused step.
Segmented reductions replace the per-molecule serial loops, unique-index
scatters replace the pair kernels, and the NH chain runs on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..units import AVOGADRO, BOLTZ, PI
from ..utils.pbc import minimum_image
from .nhchain import propagate_nh_chains
from .vv import TG_ATOM, TG_COM, TG_DRUDE, IntegratorData

f32 = jnp.float32



# ---------------------------------------------------- per-atom pair tables
def _pair_atom_tables(pairs, n):
    """Per-atom view of a disjoint (drude, parent) pair set: partner index,
    +1/-1 orientation sign (first/second element), lowest-id of the pair
    (for shared noise draws) and membership mask.

    Scatters of per-pair results back into (N,3) arrays cost ~25 us each on
    TPU (7 of them per step in the subset formulation); the per-atom form is
    one partner row-gather plus elementwise math under a static mask, which
    fuses into the surrounding step."""
    pairs = np.asarray(pairs)
    partner = np.arange(n, dtype=np.int32)
    sign = np.zeros(n, np.float32)
    lowid = np.arange(n, dtype=np.int32)
    in_pair = np.zeros(n, bool)
    if pairs.shape[0]:
        d, p = pairs[:, 0], pairs[:, 1]
        partner[d] = p
        partner[p] = d
        sign[d] = 1.0
        sign[p] = -1.0
        lo = np.minimum(d, p)
        lowid[d] = lo
        lowid[p] = lo
        in_pair[d] = True
        in_pair[p] = True
    return partner, sign, lowid, in_pair


def _partner_rows(x, partner, sign, in_pair):
    """x[partner] specialized for the common PSF layout where every Drude
    particle directly follows (or precedes) its parent: the random row
    gather (~30 us per (20k,3) array on v5e) becomes two contiguous
    shifts + a select (~3 us) whenever all partner offsets are +-1."""
    partner = np.asarray(partner)
    n = partner.shape[0]
    off = partner - np.arange(n)
    if in_pair.any() and np.all(np.isin(off[in_pair], (-1, 1))) \
            and np.all(off[~in_pair] == 0):
        up = jnp.concatenate([x[1:], x[:1]], axis=0)      # x[i+1]
        down = jnp.concatenate([x[-1:], x[:-1]], axis=0)  # x[i-1]
        sel = np.where(off == 1, 1, np.where(off == -1, 2, 0))
        sel = sel.reshape((n,) + (1,) * (x.ndim - 1))
        return jnp.where(sel == 1, up, jnp.where(sel == 2, down, x))
    return x[partner]


# ---------------------------------------------------------------- kinetics
def kinetic_energy(vel, masses):
    return 0.5 * jnp.sum(masses[:, None] * vel * vel)


def mol_runs_from_id(mol_id, tail_inert=None):
    """Contiguous-molecule runs [(atom_start, n_mol, atoms_per_mol), ...].

    PSF atom order keeps every molecule contiguous and molecules sorted, so
    per-molecule reductions become plain reshapes — no (M, Mmax) member
    gather (~37k rows/step at 19.5k atoms) and no (N,) mol_id gather for the
    broadcast back.  Returns None when the layout doesn't hold (callers then
    use the dense-table fallback).

    ``tail_inert`` (N,) bool extends the layout to the EDL wiring, where the
    image atoms appended after the real molecules REUSE the mol ids of their
    mirrored IL molecules (run-edl image bookkeeping): when every molecule is
    complete within the sorted prefix and every atom past it is COM-inert
    (massless AND outside all NH temp groups — the caller's mask), the runs
    cover the prefix exactly: the tail contributes zero to every COM and the
    broadcast back is never read at tail rows, so mol_broadcast zero-fills
    them.  Without this, the real edl_Im21 fell to the dense (1026, 624)
    member-table gather: 0.86 ms gather + 0.44 ms reduce per step on device
    (results/profile_edl_r5.txt)."""
    mid = np.asarray(mol_id)
    if mid.size == 0:
        return None
    d = np.diff(mid)
    desc = np.flatnonzero(d < 0)
    if desc.size == 0:
        n_prefix = mid.size
    else:
        # candidate prefix ends at the first descent; valid only when the
        # whole tail is COM-inert
        n_prefix = int(desc[0]) + 1
        if tail_inert is None or not bool(np.all(tail_inert[n_prefix:])):
            return None
    pre = mid[:n_prefix]
    starts = np.flatnonzero(np.r_[True, np.diff(pre) != 0])
    if not np.array_equal(pre[starts], np.arange(starts.size)):
        return None
    if desc.size and int(pre[-1]) != int(mid.max()):
        # a molecule exists only in the tail: the prefix COMs would miss it
        return None
    counts = np.diff(np.r_[starts, n_prefix])
    runs = []
    for s, c in zip(starts, counts):
        if runs and c == runs[-1][2]:
            runs[-1][1] += 1
        else:
            runs.append([int(s), 1, int(c)])
    return tuple(tuple(r) for r in runs)


def com_velocities(vel, masses, mol_id, mol_inv_masses, mol_table=None,
                   runs=None):
    """Per-molecule mass-weighted COM velocity (calcCOMVelocities,
    drudeNoseHoover.cu:5-31).  With contiguous-molecule ``runs`` this is a
    reshape + weighted sum (no gathers at all); with a dense member table a
    constant-index gather + sum; segment_sum is the last fallback."""
    if runs is not None:
        w_all = (np.asarray(masses)
                 * np.asarray(mol_inv_masses)[np.asarray(mol_id)])
        outs = []
        for s, m, apm in runs:
            w = jnp.asarray(w_all[s:s + m * apm].reshape(m, apm),
                            vel.dtype)
            comps = [jnp.sum(w * vel[s:s + m * apm, c].reshape(m, apm),
                             axis=1) for c in range(3)]
            outs.append(jnp.stack(comps, -1))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
    if mol_table is not None:
        idx = np.maximum(np.asarray(mol_table), 0)
        valid = (np.asarray(mol_table) >= 0)
        mv = (np.asarray(masses)[idx] * valid)[..., None] * vel[idx]
        return jnp.sum(mv, axis=1) * mol_inv_masses[:, None]
    mom = jax.ops.segment_sum(masses[:, None] * vel, mol_id,
                              num_segments=mol_inv_masses.shape[0])
    return mom * mol_inv_masses[:, None]


def mol_broadcast(com, runs, n=None):
    """Expand per-molecule rows (M,3) back to per-atom rows for contiguous
    runs — the no-gather replacement of com[mol_id].  When ``n`` exceeds the
    runs' coverage (COM-inert tail, see mol_runs_from_id), the tail rows are
    zero-filled: they are never read (the NH masks exclude those atoms)."""
    outs = []
    ms = 0
    covered = 0
    for s, m, apm in runs:
        comps = [jnp.broadcast_to(com[ms:ms + m, c:c + 1],
                                  (m, apm)).reshape(-1) for c in range(3)]
        outs.append(jnp.stack(comps, -1))
        ms += m
        covered = s + m * apm
    if n is not None and n > covered:
        outs.append(jnp.zeros((n - covered, 3), com.dtype))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)


# ------------------------------------------------------------- NH scaling
def nh_scale_velocities(vel, masses, inv_masses, mol_id, mol_masses,
                        mol_inv_masses, data: IntegratorData, nh_eta,
                        nh_eta_dot, nh_eta_dotdot, mol_table=None,
                        mol_runs=None):
    """One TGNH thermostat application (scaleVelocity host orchestration,
    CudaVVKernels.cpp:670-754 + drudeNoseHoover.cu kernels), fully on device.

    Returns (vel', eta', eta_dot', eta_dotdot', ke2 per group).
    """
    if data.use_com_temp_group:
        com = com_velocities(vel, masses, mol_id, mol_inv_masses,
                             mol_table, runs=mol_runs)  # (M,3)
        com_b = (mol_broadcast(com, mol_runs, n=vel.shape[0])
                 if mol_runs is not None else com[mol_id])
        vel_rel = jnp.where(data.nh_mask[:, None], vel - com_b, vel)
    else:
        com = jnp.zeros((mol_masses.shape[0], 3), vel.dtype)
        com_b = None
        vel_rel = vel

    # --- per-atom pair decomposition (shared by the KE reductions and the
    # scale application; one adjacent-partner shift instead of subset
    # gathers) ---
    n = vel.shape[0]
    nn = data.nh_normal
    masses_np = np.asarray(masses)
    nh_normal_mask = np.zeros(n, bool)
    if nn.shape[0]:
        nh_normal_mask[np.asarray(nn)] = True
    nh_normal_mask &= np.asarray(inv_masses) > 0
    partner, psign, _, in_pair = _pair_atom_tables(data.nh_pairs, n)
    if data.nh_pairs.shape[0]:
        vp = _partner_rows(vel_rel, partner, psign, in_pair)
        mp = masses_np[partner]
        mtot = np.maximum(masses_np + mp, 1e-30)
        mu_a = (masses_np * mp / mtot).astype(np.float32)
        fself = (masses_np / mtot).astype(np.float32)[:, None]
        fpart = (mp / mtot).astype(np.float32)[:, None]
        cm_a = fself * vel_rel + fpart * vp                  # pair COM vel
        rel_a = psign[:, None] * (vel_rel - vp)              # v_d - v_p

    # --- group kinetic energies (2*KE), computeNormalizedKineticEnergies ---
    # per-atom masked sums; each pair contributes through both members, so
    # the pair terms carry a factor 1/2
    ke2_atom = (jnp.sum(np.where(nh_normal_mask, masses_np, 0.0)[:, None]
                        * vel_rel * vel_rel) if nn.shape[0] else 0.0)
    if data.use_com_temp_group:
        ke2_com = jnp.sum(jnp.where(data.nh_mol_mask,
                                    mol_masses * jnp.sum(com ** 2, -1), 0.0))
    else:
        ke2_com = 0.0
    if data.nh_pairs.shape[0]:
        pair_w = np.where(in_pair, 0.5, 0.0)
        ke2_atom = ke2_atom + jnp.sum(
            (pair_w * mtot)[:, None] * cm_a * cm_a)
        ke2_drude = jnp.sum((pair_w * mu_a)[:, None] * rel_a * rel_a)
    else:
        ke2_drude = 0.0
    ke2 = jnp.stack([jnp.asarray(ke2_atom, vel.dtype),
                     jnp.asarray(ke2_com, vel.dtype),
                     jnp.asarray(ke2_drude, vel.dtype)])

    t_target = jnp.asarray([data.temperature, data.temperature,
                            data.drude_temperature], vel.dtype)
    eta, eta_dot, eta_dotdot, factors = propagate_nh_chains(
        nh_eta, nh_eta_dot, nh_eta_dotdot, data.eta_mass, ke2,
        data.temp_group_nkbt, t_target, data.dt, data.num_nh_chains,
        data.loops_per_step)
    s_atom, s_com, s_drude = factors[TG_ATOM], factors[TG_COM], factors[TG_DRUDE]

    # --- apply scale (scaleVelocity kernel, drudeNoseHoover.cu:157-209) ---
    # v_i' = s_atom*cm + sign_i * s_drude * rel * m_j/(m_i+m_j) + s_com*vcom
    com_term = s_com * com_b if data.use_com_temp_group else \
        jnp.zeros((1, 1), vel.dtype)
    new_vel = vel
    if nn.shape[0]:
        upd = s_atom * vel_rel + com_term
        new_vel = jnp.where(nh_normal_mask[:, None], upd, new_vel)
    if data.nh_pairs.shape[0]:
        upd = s_atom * cm_a + (s_drude * rel_a) * (psign[:, None] * fpart) \
            + com_term
        new_vel = jnp.where(in_pair[:, None], upd, new_vel)
    return new_vel, eta, eta_dot, eta_dotdot, ke2


def langevin_ou_update(vel, masses, key, data: IntegratorData):
    """Exact Ornstein-Uhlenbeck velocity update for the Langevin-thermostated
    particles — the middle-scheme analog of OpenMM's DrudeLangevinIntegrator.

    The reference's extra-force drag (drudeLangevin.cu) is an explicit-Euler
    discretization; against the stiff Drude oscillator (omega*dt ~ 0.6 for
    CLPol alphas) it pumps the relative DOF instead of cooling them.  The OU
    map  v <- c1 v + sqrt(kT/m (1-c1^2)) xi  with c1 = exp(-gamma dt) has the
    exact stationary distribution at any stiffness, applied per group:
    normal particles at T, Drude pair COM at T, pair relative motion at
    T_drude (same partition as addExtraForceDrudeLangevin).
    """
    dt = data.dt
    n = vel.shape[0]
    masses_np = np.asarray(masses)
    k1n, k1p = jax.random.split(key)
    if data.ld_normal.shape[0]:
        # full-N masked update (scatter-free); draws for non-LD atoms are
        # discarded by the mask
        norm_mask = np.zeros(n, bool)
        norm_mask[np.asarray(data.ld_normal)] = True
        c1 = float(np.exp(-data.friction * dt))
        sig = np.where(masses_np > 0,
                       np.sqrt(BOLTZ * data.temperature
                               / np.maximum(masses_np, 1e-30)
                               * (1.0 - c1 * c1)), 0.0).astype(np.float32)
        xi = jax.random.normal(k1n, (n, 3), vel.dtype)
        vel = jnp.where(norm_mask[:, None],
                        c1 * vel + sig[:, None] * xi, vel)
    if data.ld_pairs.shape[0]:
        # per-atom pair formulation with the noise drawn once per pair
        # (shared via the lower pair index)
        partner, psign, lowid, in_pair = _pair_atom_tables(data.ld_pairs, n)
        mp = masses_np[partner]
        mtot = np.maximum(masses_np + mp, 1e-30)
        mu = np.maximum(masses_np * mp / mtot, 1e-30)
        fself = (masses_np / mtot).astype(np.float32)[:, None]
        fpart = (mp / mtot).astype(np.float32)[:, None]
        vp = _partner_rows(vel, partner, psign, in_pair)
        cm = fself * vel + fpart * vp
        rel = psign[:, None] * (vel - vp)
        c1c = float(np.exp(-data.friction * dt))
        c1r = float(np.exp(-data.drude_friction * dt))
        sig_cm = np.sqrt(BOLTZ * data.temperature / mtot
                         * (1.0 - c1c * c1c)).astype(np.float32)[:, None]
        sig_rel = np.sqrt(BOLTZ * data.drude_temperature / mu
                          * (1.0 - c1r * c1r)).astype(np.float32)[:, None]
        xi_raw = jax.random.normal(k1p, (n, 2, 3), vel.dtype)
        # lowid is self or the adjacent preceding atom: same shift trick
        low_off = lowid - np.arange(n)
        if np.all(np.isin(low_off, (0, -1))):
            down = jnp.concatenate([xi_raw[-1:], xi_raw[:-1]], axis=0)
            xi = jnp.where((low_off == -1)[:, None, None], down, xi_raw)
        else:
            xi = xi_raw[lowid]
        cm = c1c * cm + sig_cm * xi[:, 0]
        rel = c1r * rel + sig_rel * xi[:, 1]
        vel = jnp.where(in_pair[:, None],
                        cm + psign[:, None] * fpart * rel, vel)
    return vel


# --------------------------------------------------------- extra "forces"
def langevin_extra_force(vel, masses, key, data: IntegratorData):
    """Partitioned Langevin drag+noise as an extra force
    (addExtraForceDrudeLangevin, drudeLangevin.cu:2-60).

    dragFactor = gamma; randFactor = sqrt(2 kB T gamma / dt)
    (CudaVVKernels.cpp:835-839).
    """
    n = vel.shape[0]
    f = jnp.zeros((n, 3), vel.dtype)
    drag = data.friction
    rand = jnp.sqrt(2.0 * BOLTZ * data.temperature * data.friction / data.dt)
    drag_d = data.drude_friction
    rand_d = jnp.sqrt(2.0 * BOLTZ * data.drude_temperature
                      * data.drude_friction / data.dt)
    k1, k2 = jax.random.split(key)
    if data.ld_normal.shape[0]:
        idx = data.ld_normal
        m = masses[idx][:, None]
        xi = jax.random.normal(k1, (idx.shape[0], 3), vel.dtype)
        f = f.at[idx].add(-drag * m * vel[idx] + rand * jnp.sqrt(m) * xi)
    if data.ld_pairs.shape[0]:
        d, p = data.ld_pairs[:, 0], data.ld_pairs[:, 1]
        m1, m2 = masses[d], masses[p]
        mtot = (m1 + m2)[:, None]
        mu = (m1 * m2 / (m1 + m2))[:, None]
        f1 = (m1[:, None]) / mtot
        f2 = (m2[:, None]) / mtot
        cm = vel[d] * f1 + vel[p] * f2
        rel = vel[p] - vel[d]
        xi = jax.random.normal(k2, (d.shape[0], 2, 3), vel.dtype)
        cm_f = -drag * mtot * cm + rand * jnp.sqrt(mtot) * xi[:, 0]
        rel_f = -drag_d * mu * rel + rand_d * jnp.sqrt(mu) * xi[:, 1]
        f = f.at[d].add(f1 * cm_f - rel_f)
        f = f.at[p].add(f2 * cm_f + rel_f)
    return f


def efield_extra_force(charges, data: IntegratorData):
    """q*E on electrolyte particles along z (electricField.cu:2-12);
    efscale = field * AVOGADRO converts kJ/(nm e) -> kJ/(mol nm e)
    (CudaVVKernels.cpp:978)."""
    efscale = data.electric_field * AVOGADRO
    n = charges.shape[0]
    mask = np.zeros(n, np.float32)
    mask[np.asarray(data.electrolyte)] = 1.0
    fz = efscale * np.asarray(charges) * mask            # (N,) constant
    return fz


def cos_extra_force(pos, masses, box, data: IntegratorData):
    """F_x += m * a * cos(2 pi z / Lz) (cosineAccelerate.cu:2-14)."""
    c = jnp.cos(2.0 * PI * pos[:, 2] / box[2])
    return masses * data.cos_acceleration * c


def cos_velocity_bias(pos, vel, masses, box):
    """V = sum_i m_i v_xi 2 cos(2 pi z_i/Lz) / M_total
    (calcPeriodicVelocityBias + sumV, cosineAccelerate.cu:16-61)."""
    c = jnp.cos(2.0 * PI * pos[:, 2] / box[2])
    return jnp.sum(masses * vel[:, 0] * 2.0 * c) / jnp.sum(masses)


def cos_shift_velocity(pos, vel, box, v_amp, sign):
    """v_x -> v_x + sign * V cos(2 pi z/Lz) (remove: sign=-1, restore: +1)."""
    c = jnp.cos(2.0 * PI * pos[:, 2] / box[2])
    return vel + (sign * v_amp * c)[:, None] * np.asarray(
        [1.0, 0.0, 0.0], np.float32)


def inverse_viscosity(v_amp, box, masses, acceleration):
    """1/eta = V vol/(M_total a) (2 pi/Lz)^2 in MD units
    (calcViscosity, CudaVVKernels.cpp:1112-1134).  Convert to 1/(Pa s) with
    * 6.02214076e5 (SWIG decoration, velocityverletplugin.i:75-79)."""
    vol = box[0] * box[1] * box[2]
    inv_mass_total = 1.0 / jnp.sum(masses)
    return (v_amp * vol * inv_mass_total / acceleration
            * (2.0 * PI / box[2]) ** 2)


# ------------------------------------------------------------- hard wall
def apply_hardwall(pos, vel, masses, inv_masses, box, data: IntegratorData):
    """Drude hard-wall bounce (applyHardWallConstraints, middle.cu:106-221):
    if a Drude-parent distance exceeds maxDrudeDistance, reflect the pair
    into the wall with a thermal-velocity rescale."""
    if data.drude_pairs.shape[0] == 0 or data.max_drude_distance <= 0:
        return pos, vel
    # Per-atom pair formulation (no scatters): every pair atom evaluates the
    # shared bounce solution; sign/is_drude select its own update.
    dmax = data.max_drude_distance
    hw_scale = float(np.sqrt(BOLTZ * data.drude_temperature))
    dt = data.dt
    n = pos.shape[0]
    partner, psign, _, in_pair = _pair_atom_tables(data.drude_pairs, n)
    masses_np = np.asarray(masses)
    m_self = masses_np[:, None]
    m_part = masses_np[partner][:, None]
    is_drude = (psign > 0)[:, None]
    m_drude = np.where(is_drude, m_self, m_part)      # m1 in reference terms
    # partner is massless (parent-side massless branch applies to the pair)
    inv_np = np.asarray(inv_masses)
    parent_massless = np.where(
        is_drude[:, 0], inv_np[partner] == 0, inv_np == 0.0)[:, None]

    pp = _partner_rows(pos, partner, psign, in_pair)
    vp = _partner_rows(vel, partner, psign, in_pair)
    delta = psign[:, None] * (pos - pp)   # pos_d - pos_p, both members
    r = jnp.sqrt(jnp.sum(delta * delta, -1, keepdims=True) + 1e-20)
    viol = (r > dmax) & in_pair[:, None]
    bond_dir = delta / r
    delta_r = r - dmax
    dot_self = jnp.sum(vel * bond_dir, -1, keepdims=True)
    dot_part = jnp.sum(vp * bond_dir, -1, keepdims=True)
    dot1 = jnp.where(is_drude, dot_self, dot_part)    # drude projection
    vperp = vel - bond_dir * dot_self

    # --- massless-parent branch (middle.cu:137-160): parent unchanged ---
    dt1 = jnp.where(dot1 != 0, delta_r / jnp.abs(dot1 + 1e-20), dt)
    dt1 = jnp.minimum(dt1, dt)
    new_dot1_a = -dot1 * hw_scale / (jnp.abs(dot1 + 1e-20)
                                     * np.sqrt(np.maximum(m_drude, 1e-30)))
    dr_a = -delta_r + dt1 * new_dot1_a
    pos_a = pos + bond_dir * dr_a
    vel_a = vperp + bond_dir * new_dot1_a
    pos_a = jnp.where(is_drude, pos_a, pos)
    vel_a = jnp.where(is_drude, vel_a, vel)

    # --- both-massive branch (middle.cu:161-213) ---
    mtot = np.maximum(m_self + m_part, 1e-30)
    c_self = dot_self - (m_self * dot_self + m_part * dot_part) / mtot
    vb_cm = dot_self - c_self
    c_other = dot_part - vb_cm
    dt2 = jnp.where(c_self != c_other,
                    delta_r / jnp.abs(c_self - c_other + 1e-20), dt)
    dt2 = jnp.minimum(dt2, dt)
    v_bond = hw_scale / np.sqrt(np.maximum(m_drude, 1e-30))
    nd_self = -c_self * v_bond * (m_part / mtot) / jnp.abs(c_self + 1e-20)
    dr_self = psign[:, None] * (-delta_r) * (m_part / mtot) + dt2 * nd_self
    pos_b = pos + bond_dir * dr_self
    vel_b = vperp + bond_dir * (nd_self + vb_cm)

    new_pos = jnp.where(parent_massless, pos_a, pos_b)
    new_vel = jnp.where(parent_massless, vel_a, vel_b)
    pos = jnp.where(viol, new_pos, pos)
    vel = jnp.where(viol, new_vel, vel)
    return pos, vel


# ------------------------------------------------------------ image sync
def update_image_positions(pos, data: IntegratorData):
    """Mirror image particles across the electrode plane: copy x,y; reflect z
    (updateImagePositions, imageCharge.cu:2-28)."""
    if data.image_pairs.shape[0] == 0:
        return pos
    n = pos.shape[0]
    ip = np.asarray(data.image_pairs)
    k = ip.shape[0]
    img0, par0 = int(ip[0, 0]), int(ip[0, 1])
    if (np.array_equal(ip[:, 0], np.arange(img0, img0 + k)) and
            np.array_equal(ip[:, 1], np.arange(par0, par0 + k))):
        # the standard EDL layout: images are one contiguous block
        # mirroring one contiguous parent block in order (run-edl wiring)
        # — static slices + concat run at copy bandwidth instead of a
        # full-N row gather (~55 us at 40k on v5e)
        pp = jax.lax.slice_in_dim(pos, par0, par0 + k)
        new = jnp.concatenate(
            [pp[:, 0:2], 2.0 * data.mirror_location - pp[:, 2:3]], axis=1)
        return jnp.concatenate(
            [pos[:img0], new, pos[img0 + k:]], axis=0)
    # general layout: per-atom parent table (scatter-free) — images gather
    # their parent row
    parent_of = np.arange(n, dtype=np.int32)
    parent_of[ip[:, 0]] = ip[:, 1]
    is_img = np.zeros(n, bool)
    is_img[ip[:, 0]] = True
    pp = pos[parent_of]
    new = jnp.concatenate(
        [pp[:, 0:2], 2.0 * data.mirror_location - pp[:, 2:3]], axis=1)
    return jnp.where(is_img[:, None], new, pos)


# --------------------------------------------------- compensated updates
def compensated_add(pos, err, delta):
    """pos_new = pos + delta with Kahan-style error carry — the TPU analog of
    the reference's posq+posqCorrection mixed-precision split
    (middle.cu:80-97)."""
    t = delta + err
    new = pos + t
    new_err = t - (new - pos)
    return new, new_err
