"""Physics-oracle tests (SURVEY.md section 4: analytic + statistical oracles).

The reference ships no unit tests; its de-facto validation is physical
observables.  Here we build the missing pyramid: analytic checks against
closed-form values (Madelung constant, harmonic springs, Thole damping, NH
chain math) and statistical checks (equipartition, Langevin FDT).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator
from openmm_velocityverlet_tpu.ops import ewald, nonbonded
from openmm_velocityverlet_tpu.units import BOLTZ, ONE_4PI_EPS0


def test_ewald_madelung_constant():
    """Rock-salt lattice energy must reproduce the Madelung constant
    1.74756: validates direct + reciprocal + self + exclusion-free Ewald."""
    n_side = 4  # 64 ions, a = 0.5 nm spacing
    a = 0.5
    b = SystemBuilder()
    pos = []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                q = 1.0 if (i + j + k) % 2 == 0 else -1.0
                b.add_particle(20.0, charge=q, lj_type=0)
                pos.append((i * a, j * a, k * a))
    b.set_lj_from_type_params([0.3], [0.0])
    box = np.array([n_side * a] * 3)
    system = b.finalize(box, r_cutoff=0.99, use_pme=True,
                        ewald_tolerance=1e-6)
    integ = VVIntegrator()
    ctx = Context(system, integ, positions=np.array(pos), box=box)
    terms = ctx.potential_energy_terms()
    e_coul = (terms["coul_direct"] + terms["coul_recip"] + terms["coul_self"]
              + terms.get("coul_excl_corr", 0.0))
    # E per ion pair = -M * C * q^2 / a ; 32 pairs
    madelung = -e_coul * a / (ONE_4PI_EPS0 * 64 / 2)
    assert abs(madelung - 1.747565) < 2e-3, madelung


def test_exclusion_correction_cancels_intra_pair():
    """A fully excluded 2-particle 'molecule': total Coulomb must vanish up to
    the periodic-image interaction of the neutral pair (tiny)."""
    b = SystemBuilder()
    b.add_particle(10.0, charge=0.5, lj_type=0)
    b.add_particle(10.0, charge=-0.5, lj_type=0)
    b.set_lj_from_type_params([0.3], [0.0])
    b.add_exclusion(0, 1)
    b.add_bond(0, 1, 0.1, 1000.0)
    box = np.array([8.0, 8.0, 8.0])
    system = b.finalize(box, r_cutoff=1.2, use_pme=True, ewald_tolerance=1e-6)
    ctx = Context(system, VVIntegrator(),
                  positions=np.array([[4.0, 4.0, 4.0], [4.1, 4.0, 4.0]]),
                  box=box)
    t = ctx.potential_energy_terms()
    e_coul = (t["coul_direct"] + t["coul_recip"] + t["coul_self"]
              + t["coul_excl_corr"])
    assert abs(e_coul) < 0.05, t


def test_drude_spring_isotropic():
    """E = 0.5 k d^2 with k = C q^2 / alpha."""
    b = SystemBuilder()
    b.add_particle(15.6, charge=1.0, lj_type=0)   # parent
    b.add_particle(0.4, charge=-1.0, lj_type=0)   # drude
    b.set_lj_from_type_params([0.3], [0.0])
    alpha = 1.0e-3  # nm^3
    b.add_drude(1, 0, -1, -1, -1, -1.0, alpha, 0.0, 0.0)
    b.add_exclusion(0, 1)
    box = np.array([4.0] * 3)
    system = b.finalize(box, use_pme=False)
    d = 0.01
    ctx = Context(system, VVIntegrator(),
                  positions=np.array([[2.0, 2.0, 2.0], [2.0 + d, 2.0, 2.0]]),
                  box=box)
    t = ctx.potential_energy_terms()
    k = ONE_4PI_EPS0 * 1.0 / alpha
    assert abs(t["drude"] - 0.5 * k * d * d) < 1e-3 * abs(t["drude"])


def test_thole_energy_analytic():
    """Four-site screened dipole-dipole interaction against a direct
    evaluation of the damped Coulomb formula."""
    b = SystemBuilder()
    for q in (1.0, -1.0, 1.0, -1.0):
        b.add_particle(10.0, charge=q, lj_type=0)
    b.set_lj_from_type_params([0.3], [0.0])
    a1 = a2 = 1e-3
    thole = 2.6
    b.add_thole_pair(1, 0, 3, 2, -1.0, -1.0, thole, a1, a2)
    box = np.array([6.0] * 3)
    system = b.finalize(box, use_pme=False)
    pos = np.array([[2.0, 2.0, 2.0], [2.02, 2.0, 2.0],
                    [2.5, 2.0, 2.0], [2.52, 2.01, 2.0]])
    ctx = Context(system, VVIntegrator(), positions=pos, box=box)
    t = ctx.potential_energy_terms()
    screen = thole / (a1 * a2) ** (1.0 / 6.0)
    expect = 0.0
    qd1, qd2 = -1.0, -1.0
    for (i, qi) in ((1, qd1), (0, -qd1)):
        for (j, qj) in ((3, qd2), (2, -qd2)):
            r = np.linalg.norm(pos[i] - pos[j])
            u = screen * r
            expect += (ONE_4PI_EPS0 * qi * qj / r
                       * (1 - (1 + u / 2) * math.exp(-u)))
    assert abs(t["thole"] - expect) < 1e-3 * abs(expect), (t["thole"], expect)


def test_nh_chain_matches_independent_implementation():
    """Device NH chain vs a literal scalar transcription of the reference
    update sequence (VVIntegrator.cpp:340-376)."""
    from openmm_velocityverlet_tpu.integrators.nhchain import \
        propagate_nh_chains

    def scalar_reference(eta, eta_dot, eta_dotdot, eta_mass, ke2, ke2_t, t_t,
                         dt, loops, chains):
        eta, eta_dot, eta_dotdot = list(eta), list(eta_dot), list(eta_dotdot)
        dt2 = dt / loops / 2
        dt4, dt8 = dt2 / 2, dt2 / 4
        factor = 1.0
        eta_dotdot[0] = (ke2 - ke2_t) / eta_mass[0]
        for _ in range(loops):
            for ich in range(chains - 1, -1, -1):
                expfac = math.exp(-dt8 * eta_dot[ich + 1])
                eta_dot[ich] = (eta_dot[ich] * expfac
                                + eta_dotdot[ich] * dt4) * expfac
            factor *= math.exp(-dt2 * eta_dot[0])
            for ich in range(chains):
                eta[ich] += dt2 * eta_dot[ich]
            eta_dotdot[0] = (ke2 * factor * factor - ke2_t) / eta_mass[0]
            eta_dot[0] = (eta_dot[0] * expfac + eta_dotdot[0] * dt4) * expfac
            for ich in range(1, chains):
                expfac = math.exp(-dt8 * eta_dot[ich + 1])
                eta_dotdot[ich] = (eta_mass[ich - 1] * eta_dot[ich - 1] ** 2
                                   - BOLTZ * t_t) / eta_mass[ich]
                eta_dot[ich] = (eta_dot[ich] * expfac
                                + eta_dotdot[ich] * dt4) * expfac
        return factor, eta, eta_dot

    C = 3
    rng = np.random.default_rng(1)
    eta = rng.normal(size=C) * 0.01
    eta_dot = rng.normal(size=C + 1) * 0.1
    eta_dotdot = rng.normal(size=C) * 0.1
    q = np.array([5.0, 0.3, 0.3])
    ke2, target, T = 900.0, 800.0, 300.0
    f_ref, eta_ref, etad_ref = scalar_reference(
        eta.copy(), eta_dot.copy(), eta_dotdot.copy(), q, ke2, target, T,
        0.001, 1, C)
    e, ed, edd, f = propagate_nh_chains(
        jnp.asarray(eta)[None], jnp.asarray(eta_dot)[None],
        jnp.asarray(eta_dotdot)[None], jnp.asarray(q)[None],
        jnp.asarray([ke2]), jnp.asarray([target]), jnp.asarray([T]),
        0.001, C, 1)
    np.testing.assert_allclose(float(f[0]), f_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e[0]), eta_ref, rtol=1e-4,
                               atol=1e-7)


def test_constraints_hold_under_dynamics():
    """SHAKE/RATTLE: constrained bond lengths stay at target through MD."""
    b = SystemBuilder()
    # 10 diatomics
    pos = []
    rng = np.random.default_rng(0)
    for m in range(10):
        i = b.add_particle(12.0, lj_type=0)
        j = b.add_particle(1.0, lj_type=0)
        b.add_constraint(i, j, 0.1)
        b.add_exclusion(i, j)
        base = rng.uniform(0.5, 2.5, 3)
        pos += [base, base + (0.1, 0, 0)]
    b.set_lj_from_type_params([0.3], [0.4])
    box = np.array([3.0] * 3)
    system = b.finalize(box, r_cutoff=1.0, use_pme=False)
    ctx = Context(system, VVIntegrator(temperature=300.0, step_size=0.002),
                  positions=np.array(pos), box=box)
    ctx.set_velocities_to_temperature(300.0)
    ctx.step(50)
    p = ctx.get_positions()
    d = np.linalg.norm(p[0::2] - p[1::2], axis=1)
    np.testing.assert_allclose(d, 0.1, rtol=5e-4)


def test_langevin_thermostat_fdt():
    """All-particle Langevin partition must equilibrate to the target T
    (fluctuation-dissipation: drag -gamma m v + sqrt(2 kB T gamma/dt) noise)."""
    b = SystemBuilder()
    n_side = 4
    for _ in range(n_side ** 3):
        b.add_particle(39.948, lj_type=0)
    b.set_lj_from_type_params([0.34], [0.996])
    box = np.array([n_side * 0.45] * 3)
    pos = np.stack(np.meshgrid(*[np.arange(n_side) * 0.45 + 0.2] * 3,
                               indexing="ij"), -1).reshape(-1, 3)
    system = b.finalize(box, r_cutoff=0.8, use_pme=False)
    integ = VVIntegrator(temperature=150.0, step_size=0.002)
    for i in range(n_side ** 3):
        integ.addParticleLangevin(i)
    ctx = Context(system, integ, positions=pos, box=box)
    temps = []
    for _ in range(12):
        ctx.step(100)
        ke = ctx.kinetic_energy()
        temps.append(2 * ke / (3 * system.n_atoms * BOLTZ))
    mean_t = np.mean(temps[4:])
    assert abs(mean_t - 150.0) / 150.0 < 0.15, temps


def test_image_charge_mirror_sync():
    b = SystemBuilder()
    b.add_particle(20.0, charge=0.3, lj_type=0)   # parent
    b.add_particle(20.0, charge=-0.3, lj_type=0)  # image
    b.set_lj_from_type_params([0.3], [0.1])
    box = np.array([3.0, 3.0, 6.0])
    system = b.finalize(box, use_pme=False)
    integ = VVIntegrator(temperature=100.0, step_size=0.001)
    integ.addImagePair(1, 0)
    integ.setMirrorLocation(3.0)
    ctx = Context(system, integ,
                  positions=np.array([[1.0, 1.2, 2.0], [0.0, 0.0, 0.0]]),
                  box=box)
    ctx.set_velocities([[0.5, -0.3, 0.8], [0.0, 0.0, 0.0]])
    ctx.step(5)
    p = ctx.get_positions()
    assert abs(p[1, 0] - p[0, 0]) < 1e-5
    assert abs(p[1, 1] - p[0, 1]) < 1e-5
    assert abs(p[1, 2] - (2 * 3.0 - p[0, 2])) < 1e-5


def test_electric_field_force():
    """F_z = q E * AVOGADRO on electrolyte particles only."""
    from openmm_velocityverlet_tpu.integrators import stepping
    b = SystemBuilder()
    b.add_particle(20.0, charge=0.5, lj_type=0)
    b.add_particle(20.0, charge=0.5, lj_type=0)
    b.set_lj_from_type_params([0.3], [0.0])
    box = np.array([4.0] * 3)
    system = b.finalize(box, use_pme=False)
    integ = VVIntegrator(temperature=1.0, step_size=0.001)
    integ.setElectricField(1.0)          # 1 V/nm
    integ.addParticleElectrolyte(0)
    ctx = Context(system, integ,
                  positions=np.array([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0]]),
                  box=box)
    data = ctx.data
    fz = stepping.efield_extra_force(system.charges, data)
    # 1 V/nm * 0.5 e = 0.5 * 96.485 kJ/mol/nm; only the electrolyte particle
    np.testing.assert_allclose(np.asarray(fz), [0.5 * 96.4853, 0.0],
                               rtol=1e-4)


def test_cosine_bias_and_viscosity_formula():
    from openmm_velocityverlet_tpu.integrators import stepping
    n = 50
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 4, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.3, (n, 3)), jnp.float32)
    masses = jnp.asarray(rng.uniform(1, 20, n), jnp.float32)
    box = jnp.asarray([4.0, 4.0, 4.0], jnp.float32)
    v = stepping.cos_velocity_bias(pos, vel, masses, box)
    expect = float(np.sum(np.asarray(masses) * np.asarray(vel)[:, 0] * 2
                          * np.cos(2 * np.pi * np.asarray(pos)[:, 2] / 4.0))
                   / np.sum(np.asarray(masses)))
    np.testing.assert_allclose(float(v), expect, rtol=1e-5)
    # remove then restore is identity
    vel2 = stepping.cos_shift_velocity(pos, vel, box, v, -1.0)
    vel3 = stepping.cos_shift_velocity(pos, vel2, box, v, 1.0)
    np.testing.assert_allclose(np.asarray(vel3), np.asarray(vel), atol=1e-6)


def test_checkpoint_roundtrip():
    from openmm_velocityverlet_tpu.app import load_checkpoint, save_checkpoint
    import tempfile, os
    b = SystemBuilder()
    for _ in range(8):
        b.add_particle(39.948, lj_type=0)
    b.set_lj_from_type_params([0.34], [0.996])
    box = np.array([2.0] * 3)
    pos = np.random.default_rng(0).uniform(0, 2, (8, 3))
    system = b.finalize(box, r_cutoff=0.9, use_pme=False)
    ctx = Context(system, VVIntegrator(temperature=100.0, step_size=0.002),
                  positions=pos, box=box)
    ctx.set_velocities_to_temperature(100.0)
    ctx.step(20)
    fn = tempfile.mktemp()
    save_checkpoint(ctx, fn)
    p1 = ctx.get_positions()
    ctx.step(10)
    load_checkpoint(ctx, fn)
    np.testing.assert_allclose(ctx.get_positions(), p1, atol=1e-7)
    assert ctx.current_step == 20
    os.remove(fn)
