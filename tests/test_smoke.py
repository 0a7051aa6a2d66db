"""Smoke tests: a tiny LJ fluid end-to-end through the middle integrator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator
from openmm_velocityverlet_tpu.units import BOLTZ


def make_lj_fluid(n_side=4, spacing=0.4, mass=39.948, sigma=0.34,
                  eps=0.996, charge=0.0, use_pme=False):
    b = SystemBuilder()
    n = n_side ** 3
    for i in range(n):
        b.add_particle(mass, charge=charge, lj_type=0)
    b.set_lj_from_type_params([sigma], [eps])
    box = np.array([n_side * spacing] * 3)
    pos = np.stack(np.meshgrid(*[np.arange(n_side) * spacing + spacing / 2] * 3,
                               indexing="ij"), -1).reshape(-1, 3)
    system = b.finalize(box, r_cutoff=min(0.75, box[0] / 2 * 0.9),
                        use_pme=use_pme)
    return system, pos, box


def test_lj_energy_finite():
    system, pos, box = make_lj_fluid()
    integ = VVIntegrator(temperature=120.0, step_size=0.002)
    ctx = Context(system, integ, positions=pos, box=box)
    e = ctx.potential_energy()
    assert np.isfinite(e)
    f = ctx.get_forces()
    assert np.all(np.isfinite(f))


def test_forces_match_grad_of_energy():
    """The analytic direct-space forces must equal -dE/dx numerically."""
    system, pos, box = make_lj_fluid(n_side=3)
    integ = VVIntegrator(temperature=120.0)
    ctx = Context(system, integ, positions=pos, box=box)
    rng = np.random.default_rng(0)
    pos_j = jnp.asarray(pos + rng.normal(scale=0.02, size=pos.shape),
                        jnp.float32)
    def etot(p):
        terms, _ = ctx.evaluator.energy_forces(p, jnp.asarray(box, jnp.float32))
        return sum(terms.values())

    _, f = ctx.evaluator.energy_forces(pos_j, jnp.asarray(box, jnp.float32))
    g = jax.grad(etot)(pos_j)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g),
                               rtol=2e-4, atol=2e-3)


def test_nve_energy_conservation():
    """No thermostat partition -> with all particles NH but zero-DOF... use a
    plain VV run: temperature groups exist, so instead check the middle
    integrator conserves the conserved quantity loosely via total energy
    drift of an NVE-like run with NH disabled (all Langevin-free, but NH
    always on in this integrator). We instead verify a short run is stable
    and bounded."""
    system, pos, box = make_lj_fluid(n_side=4)
    integ = VVIntegrator(temperature=120.0, frequency=5.0, step_size=0.002)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(120.0)
    e0 = ctx.potential_energy() + ctx.kinetic_energy()
    ctx.step(100)
    e1 = ctx.potential_energy() + ctx.kinetic_energy()
    assert np.isfinite(e1)
    # NH thermostat keeps energy near equipartition scale, not exploding
    n = system.n_atoms
    assert abs(e1) < 1e4


def test_nh_thermostat_reaches_temperature():
    system, pos, box = make_lj_fluid(n_side=4)
    t_target = 120.0
    integ = VVIntegrator(temperature=t_target, frequency=20.0, step_size=0.002)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(t_target * 0.5)
    temps = []
    for _ in range(20):
        ctx.step(50)
        ke = ctx.kinetic_energy()
        dof = 3 * system.n_atoms - 3
        temps.append(2 * ke / (dof * BOLTZ))
    mean_t = np.mean(temps[10:])
    assert abs(mean_t - t_target) / t_target < 0.2, temps


def test_lbfgs_minimizer_relaxes_clashes():
    """L-BFGS minimization (ommhelper/util.py:21-29 parity) drives a
    perturbed LJ fluid downhill well past where one SD step would."""
    from openmm_velocityverlet_tpu.app import Simulation
    from openmm_velocityverlet_tpu import VVIntegrator, Context

    system, pos, box = make_lj_fluid(n_side=3)
    rng = np.random.RandomState(2)
    bad = np.asarray(pos) + rng.normal(0, 0.04, (system.n_atoms, 3))
    integ = VVIntegrator(120.0, 5.0, 1.0, 20.0, 0.001)
    ctx = Context(system, integ, positions=bad, box=box)
    sim = Simulation(None, ctx)
    e0 = ctx.potential_energy()
    e_min = sim.minimize_energy(tolerance=5.0, max_iterations=200)
    assert e_min < e0 - 0.5 * abs(e0), (e0, e_min)
    f = ctx.get_forces()
    rms = float(np.sqrt(np.mean(np.sum(np.asarray(f) ** 2, -1))))
    assert rms < 50.0, rms


def test_dcd_reporter_native_roundtrip(tmp_path):
    """DCD frames (native C encoder + background IO thread) parse back with
    the correct cell, frame count and Angstrom coordinates."""
    import struct

    from openmm_velocityverlet_tpu.app import DCDReporter, Simulation

    system, pos, box = make_lj_fluid(n_side=3)
    integ = VVIntegrator(120.0, 5.0, 1.0, 20.0, 0.001)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(120.0)
    sim = Simulation(None, ctx)
    path = str(tmp_path / "t.dcd")
    rep = DCDReporter(path, 10)
    sim.reporters.append(rep)
    sim.step(30)
    rep.close()
    raw = open(path, "rb").read()
    assert raw[4:8] == b"CORD"
    assert struct.unpack("<i", raw[8:12])[0] == 3
    off = 4 + 84 + 4 + 4 + 4 + 80 + 4 + 4 + 4 + 4
    assert struct.unpack("<i", raw[off:off + 4])[0] == 48
    cell = struct.unpack("<6d", raw[off + 4:off + 52])
    np.testing.assert_allclose(cell[0], float(box[0]) * 10.0, rtol=1e-6)
    n = system.n_atoms
    xoff = off + 56
    assert struct.unpack("<i", raw[xoff:xoff + 4])[0] == 4 * n
    x = np.frombuffer(raw[xoff + 4:xoff + 4 + 4 * n], np.float32)
    assert 0.0 <= x.min() and x.max() <= float(box[0]) * 10.0 + 5.0
