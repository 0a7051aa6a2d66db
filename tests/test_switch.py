"""LJ switching function (createSystem switchDistance, reference
oplspsffile.py:1201-1211 / 1335-1345 via OpenMM's S(r) = 1 - 10x^3 + 15x^4
- 6x^5): dense-path oracle agreement, dense-vs-Pallas parity (interpret),
force consistency with the switched energy, LRC adjustment, and the
reference's validation errors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_velocityverlet_tpu.ops import allpairs, nonbonded, pallas_pair

MODEL = "/root/reference/examples/models/bulk_Im21/"


def _random_tables(n, T, rng, bandwidth=8):
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


def _setup(n=600, seed=2):
    rng = np.random.default_rng(seed)
    lj_type, a, b, excl = _random_tables(n, 5, rng)
    tables = allpairs.build_pair_tables(n, lj_type, a, b, excl)
    box = np.array([3.0, 3.0, 3.0], np.float32)
    pos = jnp.asarray(rng.uniform(0, 3.0, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 0.5, n), jnp.float32)
    return tables, box, pos, q


def test_switch_function_form():
    """S(rs)=1, S(rc)=0, C1 at both ends; dS matches FD."""
    e = jnp.ones(5)
    f = jnp.zeros(5)
    rs, rc = 0.9, 1.2
    r = jnp.asarray([0.5, 0.9, 1.05, 1.2, 1.19])
    es, fs = allpairs.lj_switch(e, f, r, 1.0 / r, rs, rc)
    s = np.asarray(es)
    np.testing.assert_allclose(s[0], 1.0)
    np.testing.assert_allclose(s[1], 1.0)
    np.testing.assert_allclose(s[2], 0.5, atol=1e-6)    # midpoint symmetry
    np.testing.assert_allclose(s[3], 0.0, atol=1e-7)
    # f_scalar = -d(S*E)/dr / r with E const: check against FD of S
    h = 1e-3
    for rv in (0.95, 1.1, 1.19):
        _, fv = allpairs.lj_switch(jnp.ones(()), jnp.zeros(()),
                                   jnp.asarray(rv), 1.0 / rv, rs, rc)
        sp, _ = allpairs.lj_switch(jnp.ones(()), jnp.zeros(()),
                                   jnp.asarray(rv + h), 1.0, rs, rc)
        sm, _ = allpairs.lj_switch(jnp.ones(()), jnp.zeros(()),
                                   jnp.asarray(rv - h), 1.0, rs, rc)
        np.testing.assert_allclose(float(fv) * rv,
                                   -(float(sp) - float(sm)) / (2 * h),
                                   rtol=2e-3)


def test_dense_switch_vs_bruteforce():
    """Dense sweep with r_switch reproduces a float64 brute-force loop."""
    tables, box, pos, q = _setup(n=180)
    beta, rc, rs = 2.2, 1.2, 0.9
    e = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 64,
                                    r_switch=rs)
    # brute force on LJ only (coulomb terms unaffected by the switch)
    p = np.asarray(pos, np.float64)
    bx = np.asarray(box, np.float64)
    onehot = np.asarray(tables["onehot"], np.float64)
    arows = np.asarray(tables["arows"], np.float64)
    brows = np.asarray(tables["brows"], np.float64)
    excl_pairs = set()
    eb = np.asarray(tables["excl_bits"])
    for i in range(len(p)):
        for d in range(1, 32):
            if (int(eb[i]) >> d) & 1 and i + d < len(p):
                excl_pairs.add((i, i + d))
    e_lj = 0.0
    n = len(p)
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in excl_pairs:
                continue
            d = p[i] - p[j]
            d -= bx * np.round(d / bx)
            r = np.sqrt((d * d).sum())
            if r >= rc:
                continue
            a = float(arows[i] @ onehot[j])
            b = float(brows[i] @ onehot[j])
            x = min(max((r - rs) / (rc - rs), 0.0), 1.0)
            s = 1.0 - x ** 3 * (10.0 - 15.0 * x + 6.0 * x * x)
            e_lj += s * (a * a / r ** 12 - b / r ** 6)
    np.testing.assert_allclose(float(e[0]), e_lj, rtol=5e-5)


@pytest.mark.parametrize("mode,kw", [
    ("band", dict(ts=128, band_w=0)),
    ("band", dict(ts=64, band_w=3)),
    ("plist", dict(ts=64, band_w=3, plist_cap=4096)),
])
def test_pallas_switch_matches_dense(mode, kw):
    tables, box, pos, q = _setup()
    beta, rc, rs = 2.2, 1.2, 0.95
    e1 = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 256,
                                     r_switch=rs)
    e2 = pallas_pair.direct_space_pallas(pos, box, q, tables, beta, rc,
                                         interpret=True, mode=mode,
                                         r_switch=rs, **kw)
    for x, y in zip(e1[:3], e2[:3]):
        np.testing.assert_allclose(float(y), float(x), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(e2[5]), np.asarray(e1[5]),
                               rtol=1e-3, atol=5e-2)


def test_switch_forces_match_energy_gradient():
    """The analytic switched force equals -grad of the switched energy
    (dense path, autodiff cross-check)."""
    tables, box, pos, q = _setup(n=120)
    beta, rc, rs = 2.2, 1.2, 0.9

    def e_tot(p):
        out = allpairs.direct_space_dense(p, box, q, tables, beta, rc, 64,
                                          r_switch=rs)
        return out[0] + out[1] + out[2] + out[3] + out[4]

    g = jax.grad(e_tot)(pos)
    f = allpairs.direct_space_dense(pos, box, q, tables, beta, rc, 64,
                                    r_switch=rs)[5]
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g),
                               rtol=2e-3, atol=2e-2)


def test_lrc_switch_correction():
    """Switched LRC > unswitched (the switch removes attractive energy
    inside rc, and the correction adds the removed part back)."""
    box = jnp.asarray([3.0, 3.0, 3.0])
    e0 = float(nonbonded.dispersion_correction(box, 0.0, 1000.0, 1.2))
    e1 = float(nonbonded.dispersion_correction(box, 0.0, 1000.0, 1.2,
                                               r_switch=0.9))
    assert e1 < e0 < 0  # B-term is negative; switched correction is larger
    # r_switch -> rc recovers the plain LRC up to the O(width) term
    # int (1-S) r^-4 = 0.5 * width * rc^-4 exactly as width -> 0
    e2 = float(nonbonded.dispersion_correction(box, 0.0, 1000.0, 1.2,
                                               r_switch=1.1999))
    expect = 2 * np.pi / 27.0 * (-1000.0) * 0.5e-4 * 1.2 ** -4
    np.testing.assert_allclose(e2 - e0, expect, rtol=1e-2)


def test_create_system_switch_validation():
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    gro = GroFile(MODEL + "conf.gro")
    psf = OplsPsfFile(MODEL + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(MODEL + "ff.prm")
    with pytest.raises(ValueError, match="too large"):
        psf.createSystem(prm, nonbondedCutoff=1.2, switchDistance=1.2)
    with pytest.raises(ValueError, match="non-negative"):
        psf.createSystem(prm, nonbondedCutoff=1.2, switchDistance=-0.1)
    built = psf.createSystem(prm, nonbondedCutoff=1.2, switchDistance=1.0)
    assert built.system.r_switch == 1.0

def test_nonbonded_method_mapping():
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    gro = GroFile(MODEL + "conf.gro")
    psf = OplsPsfFile(MODEL + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(MODEL + "ff.prm")
    s_pme = psf.createSystem(prm, nonbondedMethod="PME").system
    assert s_pme.ewald_beta > 0
    s_cut = psf.createSystem(prm, nonbondedMethod="CutoffPeriodic").system
    assert s_cut.ewald_beta == 0
    with pytest.raises(NotImplementedError, match="LJPME"):
        psf.createSystem(prm, nonbondedMethod="LJPME")
    with pytest.raises(ValueError, match="nonbondedMethod"):
        psf.createSystem(prm, nonbondedMethod="ReactionField")
