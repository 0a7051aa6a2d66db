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
