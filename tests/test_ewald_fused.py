"""Pallas-fused exact-k reciprocal (ops/ewald_pallas.py) vs the jnp
matmul formulation (ops/ewald.py).

The fused path recomputes phases tile-by-tile in VMEM instead of
materializing (N, K) matrices in HBM; the math (half-space k list,
doubled weights, f32 accumulation) is identical, so energy and forces
must agree to float32 roundoff — these tests lock that in interpret
mode on CPU.  kmax is asymmetric and N is not a tile multiple so the
k-flattening and atom-padding paths are both exercised.
"""
import jax
import jax.numpy as jnp
import numpy as np

from openmm_velocityverlet_tpu.ops import ewald, ewald_pallas


def _random_system(n=97, seed=11):
    rng = np.random.default_rng(seed)
    box = np.array([2.1, 2.6, 3.4], np.float64)
    pos = rng.uniform(0, 1, (n, 3)) * box
    q = rng.normal(0, 1, n)
    q -= q.mean()
    return (jnp.asarray(pos, jnp.float32), jnp.asarray(box, jnp.float32),
            jnp.asarray(q, jnp.float32))


BETA, KMAX = 2.8, (3, 4, 6)


def test_fused_energy_matches_matmul_path():
    pos, box, q = _random_system()
    e_ref = float(ewald.reciprocal_energy(pos, box, q, BETA, KMAX))
    e_fused = float(ewald_pallas.reciprocal_energy_fused(
        pos, box, q, BETA, KMAX, 32, True))
    np.testing.assert_allclose(e_fused, e_ref, rtol=2e-5)


def test_fused_forces_match_matmul_grad():
    pos, box, q = _random_system(seed=12)

    def e_ref(p):
        return ewald.reciprocal_energy(p, box, q, BETA, KMAX)

    def e_fused(p):
        return ewald_pallas.reciprocal_energy_fused(
            p, box, q, BETA, KMAX, 32, True)

    g_ref = jax.grad(e_ref)(pos)
    g_fused = jax.grad(e_fused)(pos)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=3e-5 * scale, rtol=2e-4)


def test_fused_box_charge_cotangents_are_zero_by_contract():
    """Documented contract: the custom backward only propagates position
    gradients (the engine differentiates positions only); box/charge
    cotangents are deliberately zero."""
    pos, box, q = _random_system(seed=13)
    g_box = jax.grad(lambda b: ewald_pallas.reciprocal_energy_fused(
        pos, b, q, BETA, KMAX, 32, True))(box)
    g_q = jax.grad(lambda c: ewald_pallas.reciprocal_energy_fused(
        pos, box, c, BETA, KMAX, 32, True))(q)
    assert float(jnp.abs(g_box).max()) == 0.0
    assert float(jnp.abs(g_q).max()) == 0.0


def test_fused_under_jit_and_tile_sizes():
    pos, box, q = _random_system(seed=14)
    e_ref = float(ewald.reciprocal_energy(pos, box, q, BETA, KMAX))
    for ts in (16, 128):
        e = float(jax.jit(
            lambda p: ewald_pallas.reciprocal_energy_fused(
                p, box, q, BETA, KMAX, ts, True))(pos))
        np.testing.assert_allclose(e, e_ref, rtol=2e-5)
