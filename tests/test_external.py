"""Auxiliary external forces (ommhelper force.py toolbox parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator
from openmm_velocityverlet_tpu.ops import external as ext
from tests.test_smoke import make_lj_fluid


def test_spring_self_restores_position():
    system, pos, box = make_lj_fluid(n_side=3)
    restraint = ext.spring_self([0, 1], pos, [1000.0, 1000.0, 1000.0])
    e0 = restraint(jnp.asarray(pos, jnp.float32), jnp.asarray(box))
    assert float(e0) == 0.0
    moved = np.array(pos)
    moved[0] += [0.1, 0, 0]
    e1 = restraint(jnp.asarray(moved, jnp.float32), jnp.asarray(box))
    np.testing.assert_allclose(float(e1), 1000.0 * 0.01, rtol=1e-5)


def test_wall_lj126_shape():
    wall = ext.wall_lj126([0], 2, (0.0, 5.0), epsilon=2.0, sigma=0.3)
    box = jnp.asarray([5.0, 5.0, 5.0])

    def e_at(z):
        p = jnp.zeros((1, 3), jnp.float32).at[0, 2].set(z)
        return float(wall(p, box))

    # at z = sigma the wall energy equals epsilon (reference docstring)
    np.testing.assert_allclose(e_at(0.3), 2.0, rtol=1e-4)
    # beyond sigma*2^(1/6) it vanishes
    assert e_at(0.5) == 0.0
    # near the wall it blows up
    assert e_at(0.05) > 1e5


def test_wall_power_shape():
    wall = ext.wall_power([0], 2, (0.0, 5.0), k=3.0, cutoff=0.5, power=2)
    box = jnp.asarray([5.0, 5.0, 5.0])

    def e_at(z):
        p = jnp.zeros((1, 3), jnp.float32).at[0, 2].set(z)
        return float(wall(p, box))

    np.testing.assert_allclose(e_at(0.0), 3.0, rtol=1e-5)  # k at the bound
    np.testing.assert_allclose(e_at(0.25), 3.0 * 0.25, rtol=1e-5)
    assert e_at(1.0) == 0.0


def test_electric_field_force_gradient():
    q = np.array([1.5, -0.5])
    f = ext.electric_field_force([0, 1], q, [0.0, 0.0, 2.0])
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)),
                      jnp.float32)
    g = jax.grad(lambda p: f(p, jnp.asarray([5., 5., 5.])))(pos)
    # F_z = -dE/dz = -conv*q*Ez
    np.testing.assert_allclose(np.asarray(g)[:, 2],
                               96.4853400990037 * q * 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g)[:, :2], 0.0, atol=1e-6)


def test_slab_correction_value():
    q = np.array([1.0, -1.0])
    f = ext.slab_correction(q)
    pos = jnp.asarray([[0., 0., 1.0], [0., 0., 3.0]], jnp.float32)
    box = jnp.asarray([4.0, 4.0, 10.0])
    muz = 1.0 * 1.0 + (-1.0) * 3.0
    expect = 2 * np.pi / 160.0 * 138.935458 * muz ** 2
    np.testing.assert_allclose(float(f(pos, box)), expect, rtol=1e-5)


def test_restrain_particle_number_counts():
    f = ext.restrain_particle_number(
        list(range(4)), 2, (0.0, 5.0), sigma=0.01, target=3.0, k=10.0)
    pos = jnp.asarray([[0, 0, 1.0], [0, 0, 2.0], [0, 0, 3.0], [0, 0, 9.0]],
                      jnp.float32)
    box = jnp.asarray([5.0, 5.0, 10.0])
    # 3 particles inside, target 3 -> ~zero energy
    assert float(f(pos, box)) < 1e-6
    f2 = ext.restrain_particle_number(
        list(range(4)), 2, (0.0, 5.0), sigma=0.01, target=2.0, k=10.0)
    np.testing.assert_allclose(float(f2(pos, box)), 0.5 * 10.0, rtol=1e-4)


def test_external_force_in_context():
    system, pos, box = make_lj_fluid(n_side=3)
    restraint = ext.spring_self(list(range(5)), pos, [500.0, 500.0, 500.0])
    integ = VVIntegrator(temperature=120.0, step_size=0.002)
    ctx = Context(system, integ, positions=pos, box=box,
                  external_forces=[restraint])
    ctx.set_velocities_to_temperature(120.0)
    ctx.step(50)
    terms = ctx.potential_energy_terms()
    assert "external_0" in terms
    assert np.isfinite(terms["external_0"])


def test_dcd_reporter_writes_valid_frames(tmp_path):
    import struct
    from openmm_velocityverlet_tpu.app import DCDReporter, Simulation
    system, pos, box = make_lj_fluid(n_side=3)
    integ = VVIntegrator(temperature=120.0, step_size=0.002)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(120.0)
    sim = Simulation(None, ctx)
    path = tmp_path / "traj.dcd"
    sim.reporters.append(DCDReporter(str(path), 10))
    sim.step(30)
    raw = path.read_bytes()
    # header magic
    assert raw[4:8] == b"CORD"
    nset = struct.unpack("<i", raw[8:12])[0]
    assert nset == 3
    n_atoms = system.n_atoms
    # frame size: unit cell (56) + 3 * (8 + 4n)
    frame = 56 + 3 * (8 + 4 * n_atoms)
    header = 92 + 92 + 12
    assert len(raw) == header + 3 * frame
    # first frame cell a == box[0] in Angstrom
    a = struct.unpack("<d", raw[header + 4:header + 12])[0]
    np.testing.assert_allclose(a, box[0] * 10.0, rtol=1e-6)


def test_dcd_reporter_append_continues_nset(tmp_path):
    """Append-mode restart: NSET in the header must count pre-restart frames
    too (OpenMM DCDReporter append semantics, run-bulk.py:90)."""
    import struct
    from openmm_velocityverlet_tpu.app import DCDReporter, Simulation
    system, pos, box = make_lj_fluid(n_side=3)
    integ = VVIntegrator(temperature=120.0, step_size=0.002)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(120.0)
    sim = Simulation(None, ctx)
    path = tmp_path / "traj.dcd"
    rep = DCDReporter(str(path), 10)
    sim.reporters.append(rep)
    sim.step(30)
    rep.close()
    # restart: new reporter appending to the same file
    sim.reporters = [DCDReporter(str(path), 10, append=True)]
    sim.step(20)
    raw = path.read_bytes()
    nset = struct.unpack("<i", raw[8:12])[0]
    assert nset == 5
    n_atoms = system.n_atoms
    frame = 56 + 3 * (8 + 4 * n_atoms)
    header = 92 + 92 + 12
    assert len(raw) == header + 5 * frame


def test_analytic_external_forces_match_autodiff():
    """spring_self and wall_lj126 analytic forces == -grad of their energy
    closures (only evaluated in the wall's active zones)."""
    import jax

    rng = np.random.RandomState(3)
    n = 40
    pos = jnp.asarray(rng.uniform(0.2, 2.8, (n, 3)), jnp.float32)
    box = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)
    parts = list(range(0, n, 3))

    spring = ext.spring_self(parts, np.asarray(pos), [100.0, 50.0, 200.0])
    g = jax.grad(lambda p: spring(p, box))(pos + 0.03)
    f = spring.analytic_force(pos + 0.03, box)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g),
                               rtol=1e-5, atol=1e-4)

    wall = ext.wall_lj126(parts, 2, (0.0, 3.0), epsilon=2.0, sigma=0.3)
    g = jax.grad(lambda p: wall(p, box))(pos)
    f = wall.analytic_force(pos, box)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g),
                               rtol=1e-4, atol=1e-3)
