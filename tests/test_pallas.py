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
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
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
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
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
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
                               rtol=1e-3, atol=5e-2)


def test_pallas_band_coverage_fallback_stays_exact():
    """An undersized band width must trip the coverage check and take the
    exhaustive full-sweep fallback — results stay EXACT (the old behavior
    was NaN-poisoning, which silently killed reporter-less runs and any
    NPT/EDL run whose density drifted past the initial band sizing)."""
    rng = np.random.default_rng(4)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl)
    # the check itself must trip for this undersized band
    cache = pallas_pair.make_pair_cache(posj, box, qj, tables, 128)
    assert bool(pallas_pair.band_coverage_bad(posj, box, cache, 128, 1, 1.2))
    out = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, 2.2, 1.2, ts=128, interpret=True, band_w=1)
    ref = allpairs.direct_space_dense(posj, box, qj, tables, 2.2, 1.2)
    for got, want, tol in zip(out[:3], ref[:3], (2e-2, 2e-2, 2e-2)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=tol, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(ref[5]),
                               rtol=2e-3, atol=2e-1)


@pytest.mark.parametrize("sort,want_energy",
                         [("z", True), ("z", False),
                          ("morton", True), ("morton", False)])
def test_pallas_plist_matches_dense(sort, want_energy):
    """AABB-culled tile-pair-list sweep == dense sweep, under both sort
    keys (thin z slabs and Morton blobs)."""
    rng = np.random.default_rng(3)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc = 2.2, 1.2
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    cnt = pallas_pair.count_candidates_np(pos, box, 128, rc + 0.1, mode=sort)
    cap = int(cnt * 1.6) + 16
    e1 = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, ts=128, interpret=True,
        mode="plist", plist_cap=cap, plist_sort=sort,
        want_energy=want_energy)
    if want_energy:
        for x, y in zip(e1[:3], e2[:3]):
            np.testing.assert_allclose(float(y), float(x), rtol=5e-5,
                                       atol=0.05)
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
                               rtol=1e-3, atol=5e-2)


def test_pallas_plist_stale_cache_falls_back_exact():
    """A badly stale plist cache (positions shifted by a third of the box)
    must trip the coverage check and take the exhaustive full-sweep
    fallback — results stay exact."""
    rng = np.random.default_rng(5)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc = 2.2, 1.2
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    # shift a subset of molecules far in z: the cached candidate set no
    # longer covers the interacting tile pairs
    shift = jnp.zeros_like(posj).at[: 300 * 4, 2].add(4.0)
    cache = pallas_pair.make_pair_cache(
        posj + shift, box, qj, tables, 128, mode="z",
        cap=int(pallas_pair.count_candidates_np(
            np.asarray(posj + shift), box, 128, rc + 0.1, mode="z")
            * 1.6) + 16, rc_cand=rc + 0.1)
    n = posj.shape[0]
    pad = cache.perm.shape[0] - n
    pos_sorted = jnp.concatenate(
        [posj, jnp.full((pad, 3), 1e6, jnp.float32)], axis=0)[cache.perm]
    assert bool(pallas_pair.plist_coverage_bad(
        pos_sorted, box, cache, 128, rc))
    e1 = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, ts=128, interpret=True,
        mode="plist", plist_cap=cache.plist.shape[0], cache=cache)
    for x, y in zip(e1[:3], e2[:3]):
        np.testing.assert_allclose(float(y), float(x), rtol=5e-5, atol=0.05)
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
                               rtol=1e-3, atol=5e-2)


def test_pallas_plist_overflow_falls_back_exact():
    """An undersized pair-list capacity must set the overflow flag and take
    the full-sweep fallback — exact results instead of dropped tiles."""
    rng = np.random.default_rng(4)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc = 2.2, 1.2
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    cache = pallas_pair.make_pair_cache(posj, box, qj, tables, 128,
                                        mode="morton", cap=3,
                                        rc_cand=rc + 0.1)
    assert bool(cache.overflow)
    e1 = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, ts=128, interpret=True,
        mode="plist", plist_cap=3, cache=cache)
    for x, y in zip(e1[:3], e2[:3]):
        np.testing.assert_allclose(float(y), float(x), rtol=5e-5, atol=0.05)
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
                               rtol=1e-3, atol=5e-2)


@pytest.mark.parametrize("want_energy", [True, False])
def _grid_mol_system(rng, nx=4, ny=4, nz=24, lz=12.0, apm=4):
    """Like _mol_system but with molecule centers on a jittered grid, so
    non-excluded pairs keep >= ~0.25 nm separation — a PHYSICAL config.
    The random placement of _mol_system produces r -> 0 overlaps whose
    clamped forces (~1e17) amplify any harmless change in the f32 distance
    arithmetic beyond any usable comparison tolerance."""
    n_mol = nx * ny * nz
    n = n_mol * apm
    T = 3
    lj_type = rng.integers(0, T, n)
    sig = rng.uniform(0.25, 0.4, T)
    eps = rng.uniform(0.1, 1.0, T)
    a = np.sqrt(np.outer(eps, eps)) ** 0.5 * np.outer(sig, sig) ** 3 * 2.0
    b = 2.0 * np.sqrt(np.outer(eps, eps)) * np.outer(sig, sig) ** 3 * 2.0
    excl = np.full((n, apm - 1), -1, np.int64)
    box = np.array([3.0, 3.0, lz], np.float32)
    spacing = box / (nx, ny, nz)
    pos = np.zeros((n, 3))
    m = 0
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                base = m * apm
                center = (np.array([ix, iy, iz]) + 0.5) * spacing \
                    + rng.uniform(-0.06, 0.06, 3)
                for k in range(apm):
                    i = base + k
                    pos[i] = center + rng.normal(0, 0.04, 3)
                    for j in range(i + 1, base + apm):
                        excl[i, j - i - 1] = j
                m += 1
    q = rng.normal(0, 0.5, n)
    return lj_type, a, b, excl, pos, box, q


@pytest.mark.parametrize("want_energy", [True, False])
def test_pallas_plist_nowrap_matches_dense(want_energy):
    """First-atom-frame minimum image on the z axis (nowrap, the z-slab
    production configuration) == dense sweep, on a tall box where tile
    pairs straddle the z wrap, with raw positions deliberately shifted out
    of [0, L) to exercise arbitrary per-atom wrap counts."""
    rng = np.random.default_rng(3)
    lj_type, a, b, excl, pos, box, q = _grid_mol_system(rng)
    # push some molecules outside [0, L): the kernel must be insensitive
    # to raw (unwrapped) coordinates
    pos[: 200 * 4, 2] -= box[2]
    pos[200 * 4: 260 * 4, 2] += 2.0 * box[2]
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc = 2.2, 1.2
    nowrap = pallas_pair.nowrap_axes_np(pos, box, 128, rc + 0.1, mode="z")
    assert nowrap == (False, False, True)
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    cnt = pallas_pair.count_candidates_np(pos, box, 128, rc + 0.1, mode="z")
    cap = int(cnt * 1.6) + 16
    e1 = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, ts=128, interpret=True,
        mode="plist", plist_cap=cap, plist_sort="z",
        want_energy=want_energy, nowrap=nowrap)
    if want_energy:
        for x, y in zip(e1[:3], e2[:3]):
            np.testing.assert_allclose(float(y), float(x), rtol=5e-5,
                                       atol=0.05)
    # the frame changes dx arithmetic by ~1 ulp, which can flip the
    # in-range classification of pairs sitting exactly AT the cutoff (the
    # dense reference has the same sensitivity against exact math); mask
    # atoms with a partner in that shell out of the force comparison
    dr = pos[:, None, :] - pos[None, :, :]
    dr -= box * np.round(dr / box)
    r = np.sqrt((dr ** 2).sum(-1))
    np.fill_diagonal(r, 1e9)
    interior = ~(np.abs(r - rc) < 5e-4).any(axis=1)
    assert interior.sum() > 0.5 * len(interior)
    np.testing.assert_allclose(np.asarray(e2[5])[interior],
                               np.asarray(e1[5])[interior],
                               rtol=1e-3, atol=5e-2)


def test_pallas_plist_nowrap_bad_axis_falls_back_exact():
    """A nowrap axis whose tile extents violate the first-atom-frame
    budget must fold into the overflow flag at build and take the exact
    full-sweep fallback (which never uses the frame)."""
    rng = np.random.default_rng(12)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc = 2.2, 1.2
    # x extents span the full 3.0 box under a z sort: x cannot qualify
    assert pallas_pair.nowrap_axes_np(pos, box, 128, rc + 0.1,
                                      mode="z")[0] is False
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    bad_nowrap = (True, False, True)
    cnt = pallas_pair.count_candidates_np(pos, box, 128, rc + 0.1, mode="z")
    cap = int(cnt * 1.6) + 16
    cache = pallas_pair.make_pair_cache(posj, box, qj, tables, 128,
                                        mode="z", cap=cap, rc_cand=rc + 0.1,
                                        nowrap=bad_nowrap)
    assert bool(cache.overflow)
    n = posj.shape[0]
    pad = cache.perm.shape[0] - n
    pos_sorted = jnp.concatenate(
        [posj, jnp.full((pad, 3), 1e6, jnp.float32)], axis=0)[cache.perm]
    assert bool(pallas_pair.plist_coverage_bad(
        pos_sorted, box, cache, 128, rc, nowrap=bad_nowrap))
    e1 = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    e2 = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, ts=128, interpret=True,
        mode="plist", plist_cap=cap, cache=cache, nowrap=bad_nowrap)
    for x, y in zip(e1[:3], e2[:3]):
        np.testing.assert_allclose(float(y), float(x), rtol=5e-5, atol=0.05)
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
                               rtol=1e-3, atol=5e-2)


def test_pallas_exc14_matches_dense_and_term_pass():
    """Kernel-handled 1-4 exceptions: pallas == dense == sparse-term-pass
    reference, energies and forces."""
    rng = np.random.default_rng(7)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    n = len(lj_type)
    # build regular 1-4 exception tables: partner = +3 within each molecule
    from openmm_velocityverlet_tpu.units import ONE_4PI_EPS0
    a14t = a * 0.5
    b14t = b * 0.6
    pairs = [(m * 4, m * 4 + 3) for m in range(384)]
    xa = 1
    exc_idx = np.full((n, xa), -1, np.int32)
    exc_qq = np.zeros((n, xa), np.float32)
    exc_c6 = np.zeros((n, xa), np.float32)
    exc_c12 = np.zeros((n, xa), np.float32)
    for (i, j) in pairs:
        ti, tj = lj_type[i], lj_type[j]
        exc_idx[i, 0] = j
        exc_idx[j, 0] = i
        qq = ONE_4PI_EPS0 * 0.5 * q[i] * q[j]
        exc_qq[i, 0] = exc_qq[j, 0] = qq
        exc_c6[i, 0] = exc_c6[j, 0] = b14t[ti, tj]
        exc_c12[i, 0] = exc_c12[j, 0] = a14t[ti, tj] ** 2
    tables = allpairs.build_pair_tables(
        n, lj_type, a, b, excl, exc_idx=exc_idx, exc_qq=exc_qq,
        exc_c6=exc_c6, exc_c12=exc_c12, charges=q)
    assert tables["has_exc14"]
    assert not tables["exc_term_mask"].any()   # all folded into the kernel
    beta, rc = 2.2, 1.2
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    d = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    p2 = pallas_pair.direct_space_pallas(posj, box, qj, tables, beta, rc,
                                         ts=128, interpret=True, band_w=3)
    for x, y in zip(d[:5], p2[:5]):
        np.testing.assert_allclose(float(y), float(x), rtol=5e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p2[5]), np.asarray(d[5]),
                               rtol=1e-3, atol=5e-2)
    # independent reference: the sparse term pass on the same exceptions
    import dataclasses
    from openmm_velocityverlet_tpu.ops import term_forces

    class Sys:
        pass
    s_ = Sys()
    s_.bonds = np.zeros((0, 2)); s_.ub_bonds = np.zeros((0, 2))
    s_.angles = np.zeros((0, 3)); s_.dihedrals = np.zeros((0, 4))
    s_.impropers = np.zeros((0, 4)); s_.drude_pairs = np.zeros((0, 2))
    s_.thole_sites = np.zeros((0, 4))
    s_.exc_idx = exc_idx; s_.exc_qq = exc_qq
    s_.exc_c6 = exc_c6; s_.exc_c12 = exc_c12
    s_.n_atoms = n
    terms, inc, slots = term_forces.build_term_tables(s_)
    es, f_ref = term_forces.energies_and_forces(
        posj, jnp.asarray(box), terms, inc, slots)
    np.testing.assert_allclose(float(d[3]), float(es["exception_coul"]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(d[4]), float(es["exception_lj"]),
                               rtol=1e-4, atol=1e-3)


def test_plist_inert_tile_culling():
    """Inert-inert tile pairs (all-massless non-vsite atoms, e.g. EDL
    image charges) are culled from the force path's pair list: forces on
    every non-inert atom stay exact vs the dense sweep, the coverage check
    does not trip, and the candidate list genuinely shrinks."""
    rng = np.random.default_rng(13)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    n = len(lj_type)
    tables = allpairs.build_pair_tables(n, lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc, ts = 2.2, 1.2, 128
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    # "images": every atom in the upper z half is inert (spatially
    # segregated, like the EDL image region)
    inert = pos[:, 2] % box[2] > box[2] / 2
    assert 0.25 < inert.mean() < 0.75
    cnt = pallas_pair.count_candidates_np(pos, box, ts, rc + 0.1,
                                          mode="morton")
    cap = int(cnt * 1.6) + 16
    cache_full = pallas_pair.make_pair_cache(
        posj, box, qj, tables, ts, mode="morton", cap=cap, rc_cand=rc + 0.1)
    cache_cull = pallas_pair.make_pair_cache(
        posj, box, qj, tables, ts, mode="morton", cap=cap, rc_cand=rc + 0.1,
        inert=jnp.asarray(inert))
    n_full = int(np.asarray(cache_full.cand).sum())
    n_cull = int(np.asarray(cache_cull.cand).sum())
    assert n_cull < n_full, (n_cull, n_full)
    assert not bool(pallas_pair.plist_coverage_bad(
        jnp.concatenate([posj, jnp.full((cache_cull.perm.shape[0] - n, 3),
                                        1e6, jnp.float32)])[cache_cull.perm],
        box, cache_cull, ts, rc))
    dense = allpairs.direct_space_dense(posj, box, qj, tables, beta, rc, 256)
    out = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, ts=ts, interpret=True,
        mode="plist", plist_cap=cap, cache=cache_cull, want_energy=False)
    f_p = np.asarray(out[5])
    f_d = np.asarray(dense[5])
    np.testing.assert_allclose(f_p[~inert], f_d[~inert], rtol=1e-3,
                               atol=5e-2)
    # no NaNs anywhere: every visited row block is initialized (diagonal
    # entries are kept for exactly this reason)
    assert np.isfinite(f_p).all()
    # ...and the cull visibly dropped inert-inert work (forces on some
    # inert atoms differ from the full sweep)
    assert np.max(np.abs(f_p[inert] - f_d[inert])) > 1.0


def test_pallas_plist_relaxed_mode_matches_strict_when_covered():
    """strict=False (the Context production default) must be bit-identical
    to strict=True whenever the coverage check is clean, and must still
    raise the cov flag (forcing a rebuild) on a stale cache."""
    rng = np.random.default_rng(6)
    lj_type, a, b, excl, pos, box, q = _mol_system(384, rng)
    tables = allpairs.build_pair_tables(len(lj_type), lj_type, a, b, excl,
                                        fold_exc14=False)
    beta, rc = 2.2, 1.2
    posj = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    cap = int(pallas_pair.count_candidates_np(
        pos, box, 128, rc + 0.1, mode="z") * 1.6) + 16
    cache = pallas_pair.make_pair_cache(posj, box, qj, tables, 128,
                                        mode="z", cap=cap, rc_cand=rc + 0.1)
    kw = dict(ts=128, interpret=True, mode="plist", plist_cap=cap,
              cache=cache, with_flag=True)
    out_s = pallas_pair.direct_space_pallas(posj, box, qj, tables, beta, rc,
                                            strict=True, **kw)
    out_r = pallas_pair.direct_space_pallas(posj, box, qj, tables, beta, rc,
                                            strict=False, **kw)
    assert not bool(out_s[6]) and not bool(out_r[6])
    np.testing.assert_array_equal(np.asarray(out_s[5]), np.asarray(out_r[5]))
    for x, y in zip(out_s[:5], out_r[:5]):
        assert float(x) == float(y)

    # stale cache: relaxed mode still flags (the step-loop rebuild trigger)
    shift = jnp.zeros_like(posj).at[: 300 * 4, 2].add(4.0)
    stale = pallas_pair.make_pair_cache(
        posj + shift, box, qj, tables, 128, mode="z", cap=cap,
        rc_cand=rc + 0.1)
    out_stale = pallas_pair.direct_space_pallas(
        posj, box, qj, tables, beta, rc, strict=False,
        ts=128, interpret=True, mode="plist", plist_cap=cap,
        cache=stale, with_flag=True)
    assert bool(out_stale[6])
    assert np.all(np.isfinite(np.asarray(out_stale[5])))
