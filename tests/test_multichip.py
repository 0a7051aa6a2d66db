"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest forces
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8).

Covers the driver's dryrun path (SURVEY.md section 2.4): the full
TGNH + Drude + constraints + Langevin step sharded over the atom axis must
(a) execute, (b) keep its sharding through the step, and (c) agree
numerically with the unsharded single-device step.
"""
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmm_velocityverlet_tpu.parallel.mesh import (carry_shardings,
                                                     make_mesh, shard_carry,
                                                     sharded_step)


@pytest.fixture(scope="module")
def drude_ctx():
    import __graft_entry__ as ge
    return ge._drude_system(n_mol=16)  # 64 atoms, divisible by 8


def test_driver_dryrun_entrypoint():
    """The exact function the driver calls must pass under the forced mesh."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_step_matches_unsharded(drude_ctx):
    ctx = drude_ctx
    step = ctx._build_step_fn()
    carry0 = ctx._make_carry()
    n_atoms = ctx.system.n_atoms

    # unsharded reference trajectory
    ref_fn = jax.jit(step)
    ref1 = ref_fn(carry0)
    ref3 = ref_fn(ref_fn(ref1))

    mesh = make_mesh(jax.devices()[:8])
    carry = shard_carry(carry0, mesh, n_atoms=n_atoms)
    fn = sharded_step(step, mesh, carry, n_atoms=n_atoms)
    out1 = fn(carry)
    out3 = fn(fn(out1))

    assert tuple(out3.state.pos.sharding.spec)[:1] == ("atoms",)
    assert tuple(out3.state.vel.sharding.spec)[:1] == ("atoms",)
    # one step: tight agreement isolates semantic divergence from the
    # chaotic amplification of f32 reduction-order differences that the
    # stiff Drude spring produces over multiple steps
    np.testing.assert_allclose(np.asarray(out1.state.pos),
                               np.asarray(ref1.state.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1.state.vel),
                               np.asarray(ref1.state.vel), atol=1e-5)
    # three steps: stays within the Lyapunov-amplified envelope
    np.testing.assert_allclose(np.asarray(out3.state.pos),
                               np.asarray(ref3.state.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out3.state.vel),
                               np.asarray(ref3.state.vel), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out3.state.nh_eta),
                               np.asarray(ref3.state.nh_eta), atol=1e-5)


def test_banded_pallas_kernel_sharded_matches_unsharded():
    """VERDICT r2 item 5: the PRODUCTION banded pair kernel (the same
    Mosaic program the TPU bench runs, interpret-mode here) executed under
    an 8-device mesh via shard_map — row tiles sharded, column reaction
    accumulator psum'd — must match the unsharded kernel and the dense
    reference bit-tightly."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_pallas import _mol_system

    from openmm_velocityverlet_tpu.ops import allpairs, pallas_pair

    rng = np.random.default_rng(9)
    lj_type, a, b, excl, pos, box, q = _mol_system(512, rng, lz=16.0)
    n = len(lj_type)                       # 2048 atoms -> 16 tiles of 128
    tables = allpairs.build_pair_tables(n, lj_type, a, b, excl)
    assert tables["residual"].shape[0] == 0
    pos = jnp.asarray(pos, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    beta, rc, ts, band_w = 2.2, 1.2, 128, 3

    cache = pallas_pair.make_pair_cache(pos, box, q, tables, ts)
    assert not bool(pallas_pair.band_coverage_bad(pos, box, cache, ts,
                                                  band_w, rc))
    ref = pallas_pair.direct_space_pallas(
        pos, box, q, tables, beta, rc, ts=ts, band_w=band_w,
        interpret=True, cache=cache)
    mesh = make_mesh(jax.devices()[:8])
    out = pallas_pair.banded_sweep_sharded(
        mesh, "atoms", pos, box, q, tables, beta, rc, ts, band_w,
        cache=cache, interpret=True)
    # energies: identical tile enumeration, identical arithmetic per shard
    for k in range(5):
        np.testing.assert_allclose(float(out[k]), float(ref[k]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(ref[5]),
                               rtol=1e-6, atol=1e-4)
    # and against the independent dense sweep
    dense = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 256)
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(dense[5]),
                               rtol=1e-3, atol=5e-2)


def test_sharded_trajectory_agreement_100_steps():
    """100-step sharded-vs-unsharded trajectory agreement (VERDICT r2 item
    5).  Uses a non-stiff LJ fluid so f32 reduction-order noise is not
    Lyapunov-amplified past any meaningful tolerance."""
    import __graft_entry__ as ge
    from openmm_velocityverlet_tpu.parallel.mesh import carry_shardings
    ctx = ge._small_system(n_side=4)       # 64 atoms, NH thermostat
    step = ctx._build_step_fn()
    carry0 = ctx._make_carry()

    def run100(c):
        return jax.lax.fori_loop(0, 100, lambda i, cc: step(cc), c)

    ref = jax.jit(run100)(carry0)

    mesh = make_mesh(jax.devices()[:8])
    carry = shard_carry(carry0, mesh, n_atoms=ctx.system.n_atoms)
    sh = carry_shardings(carry, mesh, n_atoms=ctx.system.n_atoms)
    out = jax.jit(run100, in_shardings=(sh,), out_shardings=sh)(carry)
    assert tuple(out.state.pos.sharding.spec)[:1] == ("atoms",)
    np.testing.assert_allclose(np.asarray(out.state.pos),
                               np.asarray(ref.state.pos),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.state.vel),
                               np.asarray(ref.state.vel),
                               rtol=1e-3, atol=2e-3)


def test_carry_shardings_layout(drude_ctx):
    """Per-atom arrays shard on 'atoms'; small state is replicated."""
    ctx = drude_ctx
    carry = ctx._make_carry()
    mesh = make_mesh(jax.devices()[:8])
    sh = carry_shardings(carry, mesh, n_atoms=ctx.system.n_atoms)
    assert tuple(sh.state.pos.spec)[:1] == ("atoms",)
    assert tuple(sh.forces.spec)[:1] == ("atoms",)
    assert tuple(sh.state.nh_eta.spec) == ()
    assert tuple(sh.state.box.spec) == ()
    assert tuple(sh.state.rng_key.spec) == ()


def test_context_mesh_public_api_matches_single_device():
    """VERDICT r3 item 7 (productize multi-chip): Context(mesh=...) +
    ctx.step() — the public API, no hand-wired sharding — must keep the
    atom axis sharded through the step and agree with the unsharded
    Context trajectory."""
    import __graft_entry__ as ge

    ref = ge._drude_system(n_mol=16)
    ref.step(3)
    ref_pos = np.asarray(ref._carry.state.pos)

    mesh = make_mesh(jax.devices()[:8])
    ctx = ge._drude_system(n_mol=16, mesh=mesh)
    ctx.step(3)
    pos = ctx._carry.state.pos
    assert tuple(pos.sharding.spec)[:1] == ("atoms",), pos.sharding
    np.testing.assert_allclose(np.asarray(pos), ref_pos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx._carry.state.nh_eta),
                               np.asarray(ref._carry.state.nh_eta),
                               atol=1e-5)
    # reporters read through the same public surface
    ke = ctx.kinetic_energy()
    assert np.isfinite(ke)


def test_run_bulk_mesh_flag_smoke(tmp_path, monkeypatch):
    """run-bulk --mesh N drives Context(mesh=...) through the workload
    script (CPU mesh; bulk_Im21 load + a single chunked step)."""
    import importlib.util
    models = "/root/reference/examples/models/bulk_Im21"
    if not os.path.isdir(models):
        pytest.skip("reference data absent")
    spec = importlib.util.spec_from_file_location(
        "runbulk", os.path.join(os.path.dirname(__file__), "..",
                                "examples", "run-bulk.py"))
    runbulk = importlib.util.module_from_spec(spec)
    argv = sys.argv
    sys.argv = ["run-bulk.py"]
    spec.loader.exec_module(runbulk)
    sys.argv = argv
    monkeypatch.chdir(tmp_path)
    sim = runbulk.gen_simulation(
        os.path.join(models, "conf.gro"), os.path.join(models, "topol.psf"),
        os.path.join(models, "ff.prm"), dt=0.0005, T=333,
        tcoupl="nose-hoover", pcoupl="no", mesh_devices=8)
    sim.context.step(2)
    pos = sim.context._carry.state.pos
    assert tuple(pos.sharding.spec)[:1] == ("atoms",), pos.sharding
    assert bool(jnp.isfinite(pos).all())


def test_mesh_padded_context_reporters_and_checkpoint(tmp_path, monkeypatch):
    """Ghost-padding must stay invisible to the app surface: reporters see
    n_real atoms, checkpoints round-trip, and kinetic/potential queries
    work on a mesh context with a non-divisible atom count."""
    import io

    import __graft_entry__ as ge
    from openmm_velocityverlet_tpu.app import (GroReporter, Simulation,
                                               StateDataReporter,
                                               load_checkpoint,
                                               save_checkpoint)

    monkeypatch.chdir(tmp_path)
    mesh = make_mesh(jax.devices()[:8])
    ctx = ge._drude_system(n_mol=15, mesh=mesh)   # 60 atoms -> pad to 64
    assert ctx.system.n_atoms == 64 and ctx.n_real == 60
    assert ctx.get_positions().shape == (60, 3)
    assert ctx.get_velocities().shape == (60, 3)

    class Topo:
        n_atoms = 60
        atom_names = ["X"] * 60
        residue_ids = [1] * 60
        residue_names = ["MOL"] * 60

    sim = Simulation(Topo(), ctx)
    buf = io.StringIO()
    sim.reporters.append(StateDataReporter(buf, 2))
    sim.reporters.append(GroReporter("dump.gro", 4))
    sim.step(4)
    assert "NaN" not in buf.getvalue() and buf.getvalue().count("\n") >= 2
    gro_text = open("dump.gro").read()
    assert gro_text.splitlines()[1].strip() == "60"

    save_checkpoint(ctx, "c.cpt")
    pos_before = ctx.get_positions()
    ctx.step(3)
    load_checkpoint(ctx, "c.cpt")
    np.testing.assert_allclose(ctx.get_positions(), pos_before, atol=0)
    ctx.step(2)                                   # stepping after restore
    assert np.isfinite(ctx.kinetic_energy())


def test_sharded_banded_kernel_non_divisible_tiles():
    """Tile counts that don't divide the mesh: make_pair_cache's
    tile_multiple pads the tile count itself (2056 atoms -> 17 tiles of
    128 -> padded to 24 over 8 devices) and the sharded sweep matches the
    dense reference."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_pallas import _mol_system

    from openmm_velocityverlet_tpu.ops import allpairs, pallas_pair

    rng = np.random.default_rng(11)
    lj_type, a, b, excl, pos, box, q = _mol_system(514, rng, lz=16.0)
    n = len(lj_type)
    assert n == 2056 and n % 8 == 0 and (n // 128) * 128 != n
    tables = allpairs.build_pair_tables(n, lj_type, a, b, excl)
    pos = jnp.asarray(pos, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    beta, rc, ts, band_w = 2.2, 1.2, 128, 3
    mesh = make_mesh(jax.devices()[:8])
    out = pallas_pair.banded_sweep_sharded(
        mesh, "atoms", pos, box, q, tables, beta, rc, ts, band_w,
        cache=None, interpret=True)
    dense = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 256)
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(dense[5]),
                               rtol=1e-3, atol=5e-2)
    for k in (0, 1, 2):
        np.testing.assert_allclose(float(out[k]), float(dense[k]),
                                   rtol=2e-4)
