"""TGNH temperature partition, MC barostat, Drude hardwall, VV scheme.

The TGNH check re-derives the three-group temperatures with independent
NumPy math following the reference's DrudeTemperatureReporter
(drudetemperaturereporter.py:98-133) — the de-facto validation oracle the
reference uses for its thermostat (SURVEY.md section 4).
"""
import numpy as np
import pytest

from openmm_velocityverlet_tpu import (BarostatConfig, Context,
                                       SystemBuilder, VVIntegrator)
from openmm_velocityverlet_tpu.units import BOLTZ


def make_polarizable_dumbbell_fluid(n_side=3, spacing=0.5):
    """Molecules of two bonded heavy atoms, each with a Drude particle."""
    b = SystemBuilder()
    n_mol = n_side ** 3
    alpha = 1e-3  # nm^3
    for m in range(n_mol):
        a0 = b.add_particle(12.0, charge=0.5, lj_type=0)
        d0 = b.add_particle(0.4, charge=-1.0, lj_type=1)
        a1 = b.add_particle(12.0, charge=0.5, lj_type=0)
        d1 = b.add_particle(0.4, charge=-1.0, lj_type=1)
        b.add_drude(d0, a0, -1, -1, -1, -1.0, alpha, 0.0, 0.0)
        b.add_drude(d1, a1, -1, -1, -1, -1.0, alpha, 0.0, 0.0)
        b.add_bond(a0, a1, 0.15, 2e5)
        for i in (a0, d0):
            for j in (a1, d1):
                b.add_exclusion(i, j)
        b.add_exclusion(a0, d0)
        b.add_exclusion(a1, d1)
    b.set_lj_from_type_params([0.33, 0.1], [0.5, 0.0])
    box = np.array([n_side * spacing] * 3)
    rng = np.random.default_rng(3)
    pos = np.zeros((4 * n_mol, 3))
    grid = np.stack(np.meshgrid(
        *[np.arange(n_side) * spacing + spacing / 2] * 3,
        indexing="ij"), -1).reshape(-1, 3)
    for m in range(n_mol):
        base = grid[m]
        pos[4 * m + 0] = base - [0.075, 0, 0]
        pos[4 * m + 1] = pos[4 * m + 0] + rng.normal(0, 1e-3, 3)
        pos[4 * m + 2] = base + [0.075, 0, 0]
        pos[4 * m + 3] = pos[4 * m + 2] + rng.normal(0, 1e-3, 3)
    system = b.finalize(box, r_cutoff=0.7, use_pme=True)
    return system, pos, box


def drude_temperature_partition(system, vel):
    """Independent NumPy re-derivation of the reference's
    DrudeTemperatureReporter math."""
    masses = np.asarray(system.masses)
    vel = np.asarray(vel)
    mol_id = np.asarray(system.particle_mol_id)
    n_mol = mol_id.max() + 1
    mol_mass = np.zeros(n_mol)
    np.add.at(mol_mass, mol_id, masses)
    mom = np.zeros((n_mol, 3))
    for k in range(3):
        np.add.at(mom[:, k], mol_id, masses * vel[:, k])
    vcom = mom / mol_mass[:, None]
    ke_com = 0.5 * np.sum(mol_mass * np.sum(vcom ** 2, -1))
    vrel = vel - vcom[mol_id]
    dp = np.asarray(system.drude_pairs)
    d, p = dp[:, 0], dp[:, 1]
    m1, m2 = masses[d], masses[p]
    cm = (m1[:, None] * vrel[d] + m2[:, None] * vrel[p]) / (m1 + m2)[:, None]
    rel = vrel[d] - vrel[p]
    mu = m1 * m2 / (m1 + m2)
    ke_drude = 0.5 * np.sum(mu * np.sum(rel ** 2, -1))
    is_pair = np.zeros(len(masses), bool)
    is_pair[d] = True
    is_pair[p] = True
    ke_atom = 0.5 * np.sum(masses[~is_pair]
                           * np.sum(vrel[~is_pair] ** 2, -1))
    ke_atom += 0.5 * np.sum((m1 + m2) * np.sum(cm ** 2, -1))
    n_atoms_real = (~is_pair).sum() + len(d)
    dof_com = 3 * n_mol - 3
    dof_drude = 3 * len(d)
    dof_atom = 3 * n_atoms_real - dof_com - 3 * n_mol  # relative-to-COM DOF
    dof_atom = 3 * n_atoms_real - 3 * n_mol
    t_com = 2 * ke_com / (dof_com * BOLTZ)
    t_atom = 2 * ke_atom / (dof_atom * BOLTZ)
    t_drude = 2 * ke_drude / (dof_drude * BOLTZ)
    return t_com, t_atom, t_drude


def test_tgnh_three_group_partition():
    system, pos, box = make_polarizable_dumbbell_fluid()
    integ = VVIntegrator(300.0, 20.0, 1.0, 80.0, 0.001)
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(300.0)
    assert ctx.data.num_temp_groups == 3
    ctx.step(2000)
    t_coms, t_atoms, t_drudes = [], [], []
    for _ in range(10):
        ctx.step(200)
        tc, ta, td = drude_temperature_partition(system, ctx.state.vel)
        t_coms.append(tc)
        t_atoms.append(ta)
        t_drudes.append(td)
    t_com, t_atom, t_drude = map(np.mean, (t_coms, t_atoms, t_drudes))
    assert abs(t_com - 300) < 75, t_com
    assert abs(t_atom - 300) < 75, t_atom
    assert t_drude < 30, t_drude


def test_mc_barostat_npt():
    from tests.test_smoke import make_lj_fluid
    system, pos, box = make_lj_fluid(n_side=4, spacing=0.42)
    integ = VVIntegrator(120.0, 10.0, 1.0, 40.0, 0.002)
    baro = BarostatConfig(kind="iso", pressure=200.0, temperature=120.0,
                          frequency=10)
    ctx = Context(system, integ, positions=pos, box=box, barostat=baro)
    ctx.set_velocities_to_temperature(120.0)
    v0 = float(np.prod(ctx.get_box()))
    ctx.step(800)
    v1 = float(np.prod(ctx.get_box()))
    assert np.isfinite(v1) and v1 > 0
    assert v1 != v0  # at 200 bar the box must have moved
    assert np.isfinite(ctx.potential_energy())


def test_drude_hardwall_limits_distance():
    system, pos, box = make_polarizable_dumbbell_fluid()
    integ = VVIntegrator(300.0, 20.0, 300.0, 80.0, 0.001)  # hot Drude bath
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(300.0)
    ctx.step(500)
    dp = np.asarray(system.drude_pairs)
    p = ctx.get_positions()
    d = np.linalg.norm(p[dp[:, 0]] - p[dp[:, 1]], axis=1)
    assert d.max() <= 0.02 + 1e-4, d.max()


def test_vanilla_vv_scheme_runs_and_conserves():
    from tests.test_smoke import make_lj_fluid
    system, pos, box = make_lj_fluid(n_side=4)
    integ = VVIntegrator(120.0, 10.0, 1.0, 40.0, 0.002)
    integ.setUseMiddleScheme(False)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(120.0)
    # NH thermostat on both schemes must hold temperature
    ctx.step(1500)
    ke = ctx.kinetic_energy()
    n_dof = 3 * system.n_atoms - 3
    T = 2 * ke / (n_dof * BOLTZ)
    assert abs(T - 120.0) < 40.0, T


def test_drude_spring_nve_conservation():
    """Near-NVE energy conservation with stiff Drude springs in the force
    (the middle scheme's kick+drift map has trace 2 - (omega dt)^2, stable
    and symplectic at the reference's omega*dt ~ 1)."""
    from openmm_velocityverlet_tpu.units import BOLTZ

    system, pos, box = make_polarizable_dumbbell_fluid()
    # near-NVE: NH frequencies ~0 give thermostat masses ~1/omega^2,
    # decoupling the bath over this window (NH is always on in the
    # reference integrator design)
    integ = VVIntegrator(150.0, 0.01, 1.0, 0.01, 0.0005)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(150.0, seed=7)
    e0 = ctx.potential_energy() + ctx.kinetic_energy()
    ctx.step(400)
    e1 = ctx.potential_energy() + ctx.kinetic_energy()
    n_dof = 3 * system.n_atoms
    scale = n_dof * BOLTZ * 150.0
    assert abs(e1 - e0) < 0.1 * scale, (e1 - e0, scale)
