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


# ---------------------------------------------------------------- kinetics
def kinetic_energy(vel, masses):
    return 0.5 * jnp.sum(masses[:, None] * vel * vel)


def com_velocities(vel, masses, mol_id, mol_inv_masses, mol_table=None):
    """Per-molecule mass-weighted COM velocity (calcCOMVelocities,
    drudeNoseHoover.cu:5-31).  With a dense member table this is a
    constant-index gather + sum (scatter-free); segment_sum is the
    fallback for callers without one."""
    if mol_table is not None:
        idx = np.maximum(np.asarray(mol_table), 0)
        valid = (np.asarray(mol_table) >= 0)
        mv = (np.asarray(masses)[idx] * valid)[..., None] * vel[idx]
        return jnp.sum(mv, axis=1) * mol_inv_masses[:, None]
    mom = jax.ops.segment_sum(masses[:, None] * vel, mol_id,
                              num_segments=mol_inv_masses.shape[0])
    return mom * mol_inv_masses[:, None]


# ------------------------------------------------------------- NH scaling
def nh_scale_velocities(vel, masses, inv_masses, mol_id, mol_masses,
                        mol_inv_masses, data: IntegratorData, nh_eta,
                        nh_eta_dot, nh_eta_dotdot, mol_table=None):
    """One TGNH thermostat application (scaleVelocity host orchestration,
    CudaVVKernels.cpp:670-754 + drudeNoseHoover.cu kernels), fully on device.

    Returns (vel', eta', eta_dot', eta_dotdot', ke2 per group).
    """
    if data.use_com_temp_group:
        com = com_velocities(vel, masses, mol_id, mol_inv_masses,
                             mol_table)  # (M,3)
        vel_rel = jnp.where(data.nh_mask[:, None], vel - com[mol_id], vel)
    else:
        com = jnp.zeros((mol_masses.shape[0], 3), vel.dtype)
        vel_rel = vel

    # --- group kinetic energies (2*KE), computeNormalizedKineticEnergies ---
    nn = data.nh_normal
    ke2_atom = jnp.sum(masses[nn] * jnp.sum(vel_rel[nn] ** 2, -1)) if nn.shape[0] else 0.0
    if data.use_com_temp_group:
        ke2_com = jnp.sum(jnp.where(data.nh_mol_mask,
                                    mol_masses * jnp.sum(com ** 2, -1), 0.0))
    else:
        ke2_com = 0.0
    if data.nh_pairs.shape[0]:
        d, p = data.nh_pairs[:, 0], data.nh_pairs[:, 1]
        m1, m2 = masses[d], masses[p]
        mtot = m1 + m2
        f1 = (m1 / mtot)[:, None]
        f2 = (m2 / mtot)[:, None]
        cm = vel_rel[d] * f1 + vel_rel[p] * f2
        rel = vel_rel[d] - vel_rel[p]
        mu = m1 * m2 / mtot
        ke2_atom = ke2_atom + jnp.sum(mtot * jnp.sum(cm ** 2, -1))
        ke2_drude = jnp.sum(mu * jnp.sum(rel ** 2, -1))
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
    com_term = s_com * com[mol_id] if data.use_com_temp_group else 0.0
    new_vel = vel
    if nn.shape[0]:
        upd = s_atom * vel_rel[nn] + (com_term[nn] if data.use_com_temp_group else 0.0)
        upd = jnp.where(inv_masses[nn][:, None] > 0, upd, vel[nn])
        new_vel = new_vel.at[nn].set(upd)
    if data.nh_pairs.shape[0]:
        cm_s = s_atom * cm
        rel_s = s_drude * rel
        base_d = cm_s + rel_s * f2
        base_p = cm_s - rel_s * f1
        if data.use_com_temp_group:
            base_d = base_d + com_term[d]
            base_p = base_p + com_term[p]
        new_vel = new_vel.at[d].set(base_d).at[p].set(base_p)
    return new_vel, eta, eta_dot, eta_dotdot, ke2


def harmonic_pair_drift(pos, vel, data: IntegratorData, dt):
    """Drift with the isotropic Drude spring integrated exactly.

    Non-pair atoms drift linearly.  For each Drude pair the COM drifts
    linearly while the relative coordinate rotates in (rel, vrel/omega)
    phase space — the exact solution of the k3 spring.  The anisotropy
    residual (k1, k2) stays in the force kicks (it is a small correction);
    the spring *energy* is still reported in full.  Returns (pos', vel')
    — the spring exchanges rel position and velocity, so velocities of
    pair atoms change during the drift.
    """
    new_pos = pos + dt * vel
    dp = data.drude_pairs
    if dp.shape[0] == 0 or not data.analytic_drude_spring:
        return new_pos, vel
    d, p = dp[:, 0], dp[:, 1]
    f1 = data.pair_f1[:, None]
    f2 = data.pair_f2[:, None]
    w = data.pair_omega[:, None]
    com = f1 * pos[d] + f2 * pos[p]
    vcom = f1 * vel[d] + f2 * vel[p]
    rel = pos[d] - pos[p]
    vrel = vel[d] - vel[p]
    c = jnp.cos(w * dt)
    s = jnp.sin(w * dt)
    inv_w = jnp.where(w > 0, 1.0 / jnp.maximum(w, 1e-12), dt)
    rel2 = jnp.where(w > 0, c * rel + s * inv_w * vrel, rel + dt * vrel)
    vrel2 = jnp.where(w > 0, -w * s * rel + c * vrel, vrel)
    com2 = com + dt * vcom
    new_pos = new_pos.at[d].set(com2 + f2 * rel2)
    new_pos = new_pos.at[p].set(com2 - f1 * rel2)
    vel = vel.at[d].set(vcom + f2 * vrel2)
    vel = vel.at[p].set(vcom - f1 * vrel2)
    return new_pos, vel


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
    k1n, k1p = jax.random.split(key)
    if data.ld_normal.shape[0]:
        idx = data.ld_normal
        c1 = jnp.exp(-data.friction * dt)
        m = masses[idx][:, None]
        sig = jnp.sqrt(BOLTZ * data.temperature / m * (1.0 - c1 * c1))
        xi = jax.random.normal(k1n, (idx.shape[0], 3), vel.dtype)
        vel = vel.at[idx].set(c1 * vel[idx] + sig * xi)
    if data.ld_pairs.shape[0]:
        d, p = data.ld_pairs[:, 0], data.ld_pairs[:, 1]
        m1, m2 = masses[d], masses[p]
        mtot = (m1 + m2)[:, None]
        mu = (m1 * m2 / (m1 + m2))[:, None]
        f1 = m1[:, None] / mtot
        f2 = m2[:, None] / mtot
        cm = vel[d] * f1 + vel[p] * f2
        rel = vel[d] - vel[p]
        c1c = jnp.exp(-data.friction * dt)
        c1r = jnp.exp(-data.drude_friction * dt)
        xi = jax.random.normal(k1p, (d.shape[0], 2, 3), vel.dtype)
        cm = c1c * cm + jnp.sqrt(
            BOLTZ * data.temperature / mtot * (1.0 - c1c * c1c)) * xi[:, 0]
        rel = c1r * rel + jnp.sqrt(
            BOLTZ * data.drude_temperature / mu * (1.0 - c1r * c1r)) * xi[:, 1]
        vel = vel.at[d].set(cm + f2 * rel)
        vel = vel.at[p].set(cm - f1 * rel)
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
    idx = data.electrolyte
    fz = efscale * charges[idx]
    return idx, fz


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
    return vel.at[:, 0].add(sign * v_amp * c)


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
    dmax = data.max_drude_distance
    hw_scale = jnp.sqrt(BOLTZ * data.drude_temperature)
    dt = data.dt
    d, p = data.drude_pairs[:, 0], data.drude_pairs[:, 1]
    delta = pos[d] - pos[p]          # no minimum image — reference uses raw
    r = jnp.sqrt(jnp.sum(delta * delta, -1) + 1e-20)
    viol = r > dmax
    bond_dir = delta / r[:, None]
    v1, v2 = vel[d], vel[p]
    m1 = masses[d]
    m2 = masses[p]
    inv2 = inv_masses[p]
    delta_r = r - dmax
    dot1 = jnp.sum(v1 * bond_dir, -1)
    vb1 = bond_dir * dot1[:, None]
    vp1 = v1 - vb1

    # --- massless-parent branch (middle.cu:137-160) ---
    dt1 = jnp.where(dot1 != 0, delta_r / jnp.abs(dot1 + 1e-20), dt)
    dt1 = jnp.minimum(dt1, dt)
    new_dot1_a = -dot1 * hw_scale / (jnp.abs(dot1 + 1e-20) * jnp.sqrt(m1))
    dr_a = -delta_r + dt1 * new_dot1_a
    pos_d_a = pos[d] + bond_dir * dr_a[:, None]
    vel_d_a = vp1 + bond_dir * new_dot1_a[:, None]

    # --- both-massive branch (middle.cu:161-213) ---
    mtot = m1 + m2
    inv_tot = 1.0 / mtot
    dot2 = jnp.sum(v2 * bond_dir, -1)
    vp2 = v2 - bond_dir * dot2[:, None]
    vb_cm = (m1 * dot1 + m2 * dot2) * inv_tot
    c1 = dot1 - vb_cm
    c2 = dot2 - vb_cm
    dt2 = jnp.where(c1 != c2, delta_r / jnp.abs(c1 - c2 + 1e-20), dt)
    dt2 = jnp.minimum(dt2, dt)
    v_bond = hw_scale / jnp.sqrt(m1)
    nd1 = -c1 * v_bond * m2 * inv_tot / jnp.abs(c1 + 1e-20)
    nd2 = -c2 * v_bond * m1 * inv_tot / jnp.abs(c2 + 1e-20)
    dr1 = -delta_r * m2 * inv_tot + dt2 * nd1
    dr2 = delta_r * m1 * inv_tot + dt2 * nd2
    pos_d_b = pos[d] + bond_dir * dr1[:, None]
    pos_p_b = pos[p] + bond_dir * dr2[:, None]
    vel_d_b = vp1 + bond_dir * (nd1 + vb_cm)[:, None]
    vel_p_b = vp2 + bond_dir * (nd2 + vb_cm)[:, None]

    massless = inv2 == 0
    new_pos_d = jnp.where(massless[:, None], pos_d_a, pos_d_b)
    new_vel_d = jnp.where(massless[:, None], vel_d_a, vel_d_b)
    new_pos_p = jnp.where(massless[:, None], pos[p], pos_p_b)
    new_vel_p = jnp.where(massless[:, None], vel[p], vel_p_b)

    vm = viol[:, None]
    pos = pos.at[d].set(jnp.where(vm, new_pos_d, pos[d]))
    pos = pos.at[p].set(jnp.where(vm, new_pos_p, pos[p]))
    vel = vel.at[d].set(jnp.where(vm, new_vel_d, vel[d]))
    vel = vel.at[p].set(jnp.where(vm, new_vel_p, vel[p]))
    return pos, vel


# ------------------------------------------------------------ image sync
def update_image_positions(pos, data: IntegratorData):
    """Mirror image particles across the electrode plane: copy x,y; reflect z
    (updateImagePositions, imageCharge.cu:2-28)."""
    if data.image_pairs.shape[0] == 0:
        return pos
    img, par = data.image_pairs[:, 0], data.image_pairs[:, 1]
    pp = pos[par]
    new = jnp.stack([pp[:, 0], pp[:, 1],
                     2.0 * data.mirror_location - pp[:, 2]], -1)
    return pos.at[img].set(new)


# --------------------------------------------------- compensated updates
def compensated_add(pos, err, delta):
    """pos_new = pos + delta with Kahan-style error carry — the TPU analog of
    the reference's posq+posqCorrection mixed-precision split
    (middle.cu:80-97)."""
    t = delta + err
    new = pos + t
    new_err = t - (new - pos)
    return new, new_err
