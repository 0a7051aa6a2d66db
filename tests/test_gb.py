"""Generalized-Born implicit solvent (ops/gb.py): analytic limits, an
independent scalar-loop oracle, autodiff-vs-finite-difference forces, and
createSystem wiring (reference surface: oplspsffile.py:797-799, 1532-1610).

OpenMM is not installed here, so there is no direct customgbforces
cross-check; the oracle below re-implements the published HCT/OBC equations
as plain scalar loops (independent of the chunked/vectorized device path)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_velocityverlet_tpu.ops import gb

ONE = gb.ONE_4PI_EPS0
MODEL = "/root/reference/examples/models/bulk_Im21/"


# ------------------------------------------------------- scalar-loop oracle
def oracle(pos, q, radii, screen, model, eps_in=1.0, eps_out=78.5,
           kappa=0.0, sasa=False):
    pos = np.asarray(pos, np.float64)
    q = np.asarray(q, np.float64)
    radii = np.asarray(radii, np.float64)
    orr = np.maximum(radii - gb.GB_OFFSET, 1e-4)
    sr = np.asarray(screen, np.float64) * orr
    n = len(q)
    integral = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j or sr[j] <= 0:
                continue
            r = float(np.linalg.norm(pos[i] - pos[j]))
            u = r + sr[j]
            if u <= orr[i]:
                continue
            ell = max(orr[i], abs(r - sr[j]))
            term = (1.0 / ell - 1.0 / u
                    + 0.25 * (1.0 / u ** 2 - 1.0 / ell ** 2)
                    * (r - sr[j] ** 2 / r)
                    + 0.5 * math.log(ell / u) / r)
            if sr[j] - r - orr[i] > 0:
                term += 2.0 * (1.0 / orr[i] - 1.0 / ell)
            integral[i] += 0.5 * term
    if model == gb.GB_HCT:
        born = 1.0 / (1.0 / orr - integral)
    else:
        a, b_, g = gb._OBC_ABG[model]
        psi = integral * orr
        born = 1.0 / (1.0 / orr
                      - np.tanh(a * psi - b_ * psi ** 2 + g * psi ** 3)
                      / radii)

    def scale(f):
        return 1.0 / eps_in - np.exp(-kappa * f) / eps_out

    e = 0.0
    for i in range(n):
        e += -0.5 * ONE * q[i] ** 2 * scale(born[i]) / born[i]
        for j in range(i):
            r2 = float(np.sum((pos[i] - pos[j]) ** 2))
            bb = born[i] * born[j]
            f = math.sqrt(r2 + bb * math.exp(-r2 / (4.0 * bb)))
            e += -ONE * q[i] * q[j] * scale(f) / f
    if sasa:
        for i in range(n):
            if sr[i] > 0:
                e += (gb.ACE_GAMMA * (radii[i] + gb.ACE_PROBE) ** 2
                      * (radii[i] / born[i]) ** 6)
    return e, born


def _cluster(n=8, seed=3):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 0.6, (n, 3))
    q = rng.uniform(-0.8, 0.8, n)
    radii = rng.choice([0.12, 0.15, 0.17, 0.155], n)
    screen = rng.choice([0.85, 0.72, 0.79], n)
    return pos, q, radii, screen


def _gbdata(radii, screen, model, **kw):
    radii = np.asarray(radii, np.float64)
    orr = np.maximum(radii - gb.GB_OFFSET, 1e-4)
    return gb.GBData(radii=jnp.asarray(radii, jnp.float32),
                     or_radii=jnp.asarray(orr, jnp.float32),
                     sr_radii=jnp.asarray(screen * orr, jnp.float32),
                     model=model, **kw)


def test_single_particle_analytic():
    """No neighbors: B = offset radius exactly; Born self energy is the
    textbook -0.5*C*q^2*(1/eps_in - 1/eps_out)/B."""
    d = _gbdata([0.15], [0.85], gb.GB_OBC2)
    pos = jnp.zeros((1, 3))
    b = np.asarray(gb.born_radii(pos, d))
    np.testing.assert_allclose(b, [0.141], rtol=1e-6)
    e = float(gb.gb_energy(pos, jnp.asarray([1.0]), d))
    expect = -0.5 * ONE * (1.0 - 1.0 / 78.5) / 0.141
    np.testing.assert_allclose(e, expect, rtol=1e-5)


@pytest.mark.parametrize("model", [gb.GB_HCT, gb.GB_OBC1, gb.GB_OBC2])
def test_cluster_vs_scalar_oracle(model):
    pos, q, radii, screen = _cluster()
    d = _gbdata(radii, screen, model)
    e_ref, b_ref = oracle(pos, q, radii, screen, model)
    b = np.asarray(gb.born_radii(jnp.asarray(pos, jnp.float32), d))
    np.testing.assert_allclose(b, b_ref, rtol=2e-5)
    e = float(gb.gb_energy(jnp.asarray(pos, jnp.float32),
                           jnp.asarray(q, jnp.float32), d))
    np.testing.assert_allclose(e, e_ref, rtol=2e-5)


def test_salt_and_sasa_vs_oracle():
    pos, q, radii, screen = _cluster(seed=11)
    d = _gbdata(radii, screen, gb.GB_OBC2, kappa=1.3, sasa=True,
                solvent_dielectric=80.0, solute_dielectric=2.0)
    e_ref, _ = oracle(pos, q, radii, screen, gb.GB_OBC2, eps_in=2.0,
                      eps_out=80.0, kappa=1.3, sasa=True)
    e = float(gb.gb_energy(jnp.asarray(pos, jnp.float32),
                           jnp.asarray(q, jnp.float32), d))
    np.testing.assert_allclose(e, e_ref, rtol=2e-5)


def test_chunking_invariance():
    pos, q, radii, screen = _cluster(n=9, seed=5)
    d = _gbdata(radii, screen, gb.GB_OBC1)
    p = jnp.asarray(pos, jnp.float32)
    qj = jnp.asarray(q, jnp.float32)
    e1 = float(gb.gb_energy(p, qj, d, chunk=4))
    e2 = float(gb.gb_energy(p, qj, d, chunk=1024))
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


def test_distant_pair_is_screened_coulomb():
    """r >> B: f -> r and the pair energy tends to the solvent-screened
    Coulomb correction -C*q1*q2*(1/eps_in - 1/eps_out)/r."""
    d = _gbdata([0.15, 0.15], [0.85, 0.85], gb.GB_OBC2)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [8.0, 0.0, 0.0]], jnp.float32)
    q = jnp.asarray([1.0, -1.0], jnp.float32)
    e = float(gb.gb_energy(pos, q, d))
    e_self = 2 * (-0.5) * ONE * (1 - 1 / 78.5) / 0.141
    e_pair = ONE * (1 - 1 / 78.5) / 8.0
    np.testing.assert_allclose(e - e_self, e_pair, rtol=1e-4)


def test_forces_match_finite_difference():
    pos, q, radii, screen = _cluster(n=5, seed=9)
    d = _gbdata(radii, screen, gb.GB_OBC2, sasa=True)
    qj = jnp.asarray(q, jnp.float32)
    grad = np.asarray(jax.grad(
        lambda p: gb.gb_energy(p, qj, d))(jnp.asarray(pos, jnp.float32)))
    # float64 finite differences of the oracle (same math, independent code)
    h = 1e-6
    for (i, c) in [(0, 0), (2, 1), (4, 2)]:
        pp = pos.copy()
        pp[i, c] += h
        ep, _ = oracle(pp, q, radii, screen, gb.GB_OBC2, sasa=True)
        pp[i, c] -= 2 * h
        em, _ = oracle(pp, q, radii, screen, gb.GB_OBC2, sasa=True)
        np.testing.assert_allclose(grad[i, c], (ep - em) / (2 * h),
                                   rtol=3e-4, atol=1e-3)


# ------------------------------------------------------- parameter tables
def test_standard_params_tables():
    # CH4-like: C bonded to 4 H, plus an O-H and an N-H
    masses = [12.011, 1.008, 1.008, 1.008, 1.008, 15.999, 1.008,
              14.007, 1.008, 0.4]
    bonds = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (7, 8)]
    radii, screen, ghost = gb.standard_gb_params(masses, bonds, gb.GB_OBC2)
    np.testing.assert_allclose(radii[0], 0.17)     # C
    np.testing.assert_allclose(radii[1], 0.12)     # H-on-C (mbondi2)
    np.testing.assert_allclose(radii[5], 0.15)     # O
    np.testing.assert_allclose(radii[8], 0.13)     # H-on-N (mbondi2)
    np.testing.assert_allclose(screen[0], 0.72)
    np.testing.assert_allclose(screen[5], 0.85)
    assert ghost[9] and screen[9] == 0.0           # Drude: no descreening
    radii_h, _, _ = gb.standard_gb_params(masses, bonds, gb.GB_HCT)
    np.testing.assert_allclose(radii_h[1], 0.13)   # H-on-C (mbondi)
    np.testing.assert_allclose(radii_h[6], 0.08)   # H-on-O (mbondi)


# ------------------------------------------------------- createSystem wiring
@pytest.fixture(scope="module")
def loaded():
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    gro = GroFile(MODEL + "conf.gro")
    psf = OplsPsfFile(MODEL + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(MODEL + "ff.prm")
    return gro, psf, prm


def test_create_system_gb_wiring(loaded):
    gro, psf, prm = loaded
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             use_pme=False, implicitSolvent="OBC2",
                             implicitSolventSaltConc=0.15, gbsaModel="ACE")
    s = built.system
    assert s.gb is not None and s.gb.model == gb.GB_OBC2 and s.gb.sasa
    assert not s.use_dispersion_correction
    expect_kappa = 7.3 * 50.33355 * math.sqrt(0.15 / 78.5 / 298.15)
    np.testing.assert_allclose(s.gb.kappa, expect_kappa, rtol=1e-6)
    # Drude particles must not descreen
    dr = np.asarray(s.drude_pairs)[:, 0]
    assert (np.asarray(s.gb.sr_radii)[dr] == 0).all()
    # the term appears in the smooth-energy path and is finite
    from openmm_velocityverlet_tpu.forces import ForceEvaluator
    ev = ForceEvaluator(s, box_hint=np.asarray(gro.box),
                        pos_hint=np.asarray(gro.positions))
    terms, forces = ev.energy_forces(
        jnp.asarray(gro.positions, jnp.float32),
        jnp.asarray(gro.box, jnp.float32))
    assert "gb" in terms and np.isfinite(float(terms["gb"]))
    assert np.isfinite(np.asarray(forces)).all()


def test_create_system_gb_guards(loaded):
    gro, psf, prm = loaded
    with pytest.raises(ValueError, match="GBSA"):
        psf.createSystem(prm, implicitSolvent="OBC2")       # PME + GB
    with pytest.raises(NotImplementedError, match="GBn"):
        psf.createSystem(prm, use_pme=False, implicitSolvent="GBn2")
    with pytest.raises(ValueError, match="gbsaModel"):
        psf.createSystem(prm, use_pme=False, implicitSolvent="HCT",
                         gbsaModel="SASA")
    with pytest.raises(ValueError, match="implicitSolvent"):
        psf.createSystem(prm, use_pme=False, implicitSolvent="OBC3")


def test_hydrogen_mass_repartition(loaded):
    gro, psf, prm = loaded
    plain = psf.createSystem(prm).system
    built = psf.createSystem(prm, hydrogenMass=1.5).system
    m0 = np.asarray(plain.masses)
    m1 = np.asarray(built.masses)
    np.testing.assert_allclose(m1.sum(), m0.sum(), rtol=1e-6)
    is_h = (m0 > 0.9) & (m0 < 3.5)
    assert (np.abs(m1[is_h] - 1.5) < 1e-6).all()
    is_drude = m0 == np.float32(0.4)
    np.testing.assert_allclose(m1[is_drude], m0[is_drude])


def test_replicate_and_pad_guards(loaded):
    gro, psf, prm = loaded
    from openmm_velocityverlet_tpu.models.replicate import replicate
    from openmm_velocityverlet_tpu.system import pad_system
    built = psf.createSystem(prm, use_pme=False, implicitSolvent="HCT")
    with pytest.raises(NotImplementedError):
        replicate(built.system, gro.positions, gro.box, (1, 1, 2))
    with pytest.raises(NotImplementedError):
        pad_system(built.system, built.system.n_atoms + 6)
