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
