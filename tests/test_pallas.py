"""Parity of the Pallas all-pairs kernel vs the jnp dense sweep.

Runs in Pallas interpret mode so it works on the CPU test mesh; on real TPU
the compiled kernel takes the same code path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openmm_velocityverlet_tpu.ops import allpairs, pallas_pair


def _random_tables(n, T, rng, bandwidth=8):
    """bandwidth > 31 exercises the residual excluded-pair adjustment."""
    lj_type = rng.integers(0, T, n)
    sig = rng.uniform(0.25, 0.4, T)
    eps = rng.uniform(0.1, 1.0, T)
    a = np.sqrt(np.outer(eps, eps)) ** 0.5 * np.outer(sig, sig) ** 3 * 2.0
    b = 2.0 * np.sqrt(np.outer(eps, eps)) * np.outer(sig, sig) ** 3 * 2.0
    excl = np.full((n, 4), -1, np.int64)
    for i in range(n):
        k = 0
        for d in rng.integers(1, bandwidth, 2):
            j = i + int(d)
            if j < n:
                excl[i, k] = j
                k += 1
    return lj_type, a, b, excl


@pytest.mark.parametrize("use_groups,symmetric,bandwidth",
                         [(False, False, 8), (True, False, 8),
                          (False, True, 8), (True, True, 8),
                          (False, True, 60)])
def test_pallas_matches_dense(use_groups, symmetric, bandwidth):
    rng = np.random.default_rng(0)
    n, T = 700, 5
    lj_type, a, b, excl = _random_tables(n, T, rng, bandwidth=bandwidth)
    lj_group = rng.integers(0, 2, n) if use_groups else None
    allowed = np.array([[True, True], [True, False]]) if use_groups else None
    tables = allpairs.build_pair_tables(n, lj_type, a, b, excl,
                                        lj_group, allowed)
    box = np.array([3.0, 3.0, 3.0], np.float32)
    pos = jnp.asarray(rng.uniform(0, 3.0, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 0.5, n), jnp.float32)
    beta, rc = 2.2, 1.2

    e1 = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(pos, box, q, tables, beta, rc,
                                         tm=128, tn=128, ts=128,
                                         interpret=True,
                                         symmetric=symmetric)
    for x, y in zip(e1[:3], e2[:3]):
        np.testing.assert_allclose(float(y), float(x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(e2[3]), np.asarray(e1[3]),
                               rtol=1e-3, atol=5e-2)


def _mol_system(n_mol, rng, lz=12.0, apm=4):
    """Molecule-structured system: apm consecutive atoms per molecule with
    full intra-molecular exclusions, members spatially tight around a random
    center (the physical contract behind z-banding: excluded pairs are
    always within the cutoff).  Some molecules straddle the z wrap."""
    n = n_mol * apm
    T = 3
    lj_type = rng.integers(0, T, n)
    sig = rng.uniform(0.25, 0.4, T)
    eps = rng.uniform(0.1, 1.0, T)
    a = np.sqrt(np.outer(eps, eps)) ** 0.5 * np.outer(sig, sig) ** 3 * 2.0
    b = 2.0 * np.sqrt(np.outer(eps, eps)) * np.outer(sig, sig) ** 3 * 2.0
    excl = np.full((n, apm - 1), -1, np.int64)
    pos = np.zeros((n, 3))
    for m in range(n_mol):
        base = m * apm
        center = rng.uniform(0, 1, 3) * np.array([3.0, 3.0, lz])
        for k in range(apm):
            i = base + k
            pos[i] = center + rng.normal(0, 0.05, 3)
            for j in range(i + 1, base + apm):
                excl[i, j - i - 1] = j
    box = np.array([3.0, 3.0, lz], np.float32)
    q = rng.normal(0, 0.5, n)
    return lj_type, a, b, excl, pos, box, q


@pytest.mark.parametrize("want_energy", [True, False])
def test_pallas_banded_matches_dense(want_energy):
    """z-banded sorted sweep == dense sweep on a long-box molecular system
    where banding actually prunes tiles (12 tiles, W=3)."""
    rng = np.random.default_rng(3)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl)
    # clusters must be small (one molecule each), not one merged range
    assert len(np.unique(tables["cluster_ref"])) == 384
    beta, rc = 2.2, 1.2
    pos = jnp.asarray(pos, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    e1 = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(pos, box, q, tables, beta, rc,
                                         ts=128, interpret=True,
                                         band_w=3, want_energy=want_energy)
    if want_energy:
        for x, y in zip(e1[:3], e2[:3]):
            np.testing.assert_allclose(float(y), float(x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(e2[3]), np.asarray(e1[3]),
                               rtol=1e-3, atol=5e-2)


def test_pallas_banded_stale_cache_matches_dense():
    """A PairCache built from perturbed (stale) positions must still give
    exact results — the kernel tests exclusions by original index and the
    coverage check runs on current positions."""
    rng = np.random.default_rng(5)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl)
    beta, rc = 2.2, 1.2
    pos = jnp.asarray(pos, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    stale_pos = pos + jnp.asarray(
        rng.normal(0, 0.03, pos.shape), jnp.float32)
    cache = pallas_pair.make_pair_cache(stale_pos, box, q, tables, ts=128)
    e1 = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(pos, box, q, tables, beta, rc,
                                         ts=128, interpret=True, band_w=3,
                                         cache=cache)
    for x, y in zip(e1[:3], e2[:3]):
        # a stale sort changes f32 summation order; allow a small atol
        np.testing.assert_allclose(float(y), float(x), rtol=5e-5, atol=0.05)
    np.testing.assert_allclose(np.asarray(e2[3]), np.asarray(e1[3]),
                               rtol=1e-3, atol=5e-2)


def test_pallas_band_coverage_flag_poisons():
    """An undersized band width must poison the forces with NaN instead of
    silently dropping in-cutoff pairs."""
    rng = np.random.default_rng(4)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl)
    out = pallas_pair.direct_space_pallas(
        jnp.asarray(pos, jnp.float32), box, jnp.asarray(q, jnp.float32),
        tables, 2.2, 1.2, ts=128, interpret=True, band_w=1)
    assert not bool(np.isfinite(np.asarray(out[3])).all())
