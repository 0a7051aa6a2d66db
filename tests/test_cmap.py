"""CMAP torsion cross-terms: bicubic spline construction, device energy,
autodiff forces, PRM parsing, and full-pipeline integration.

No bundled reference model carries CMAP terms, so the oracles are
synthetic: exact knot interpolation + C1 continuity of the patch
coefficients, an analytic smooth surface (cos phi + sin psi) the spline
must reproduce with spectral-level accuracy at R=24, a constant map whose
pipeline energy is exactly known and whose forces are exactly zero, and
autodiff-vs-analytic/finite-difference force agreement.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_velocityverlet_tpu.ops import cmap
from openmm_velocityverlet_tpu.ops.bonded import _dihedral_angle

MODELS = "/root/reference/examples/models/"
MODEL = MODELS + "bulk_Im21/"


def test_bicubic_exact_at_knots_and_c1():
    rng = np.random.default_rng(7)
    g = rng.normal(0, 3, (8, 8))
    c = cmap.build_cmap_coeffs(g).astype(np.float64)   # (8,8,4,4), f32 store
    # value at cell origin (t=u=0) is the knot value
    np.testing.assert_allclose(c[:, :, 0, 0], g, rtol=1e-6, atol=1e-6)
    # C0: E(i, t=1, u=0) == E(i+1, t=0, u=0)
    right = c[:, :, :, 0].sum(axis=2)              # sum_a c[a,0]
    np.testing.assert_allclose(right, np.roll(g, -1, 0), rtol=1e-5,
                               atol=1e-5)
    # C1 across the cell boundary in t: dE/dt at t=1 equals next cell's at 0
    a = np.arange(4)
    dright = (c[:, :, :, 0] * a).sum(axis=2)       # sum_a a*c[a,0] at t=1
    dleft = np.roll(c[:, :, 1, 0], -1, 0)          # next cell dE/dt at t=0
    np.testing.assert_allclose(dright, dleft, rtol=1e-4, atol=1e-5)
    # periodic seam: last cell's right edge wraps onto cell 0 (roll covers
    # it: row R-1 compared against roll(g,-1)[R-1] = g[0])


def _pentane_like(phi_target=None):
    """5-atom chain with adjustable backbone; returns (pos, box, atoms8)."""
    pos = np.array([[0.0, 0.1, 0.0],
                    [0.15, 0.0, 0.0],
                    [0.3, 0.1, 0.05],
                    [0.45, 0.05, -0.05],
                    [0.6, 0.15, 0.02]], np.float32)
    box = np.array([5.0, 5.0, 5.0], np.float32)
    atoms8 = np.array([[0, 1, 2, 3, 1, 2, 3, 4]], np.int32)
    return pos, box, atoms8


def test_cmap_energy_matches_analytic_surface():
    """Spline through E(phi,psi) = cos(phi) + sin(psi) sampled at R=24
    reproduces the surface to ~1e-5 at arbitrary angles."""
    R = 24
    ang = -np.pi + 2 * np.pi * np.arange(R) / R
    grid = np.cos(ang)[:, None] + np.sin(ang)[None, :]
    coeffs, res = cmap.pack_cmap_maps([grid])
    pos, box, atoms8 = _pentane_like()
    phi = float(_dihedral_angle(jnp.asarray(pos), jnp.asarray(box),
                                jnp.asarray(atoms8[:, :4]))[0])
    psi = float(_dihedral_angle(jnp.asarray(pos), jnp.asarray(box),
                                jnp.asarray(atoms8[:, 4:]))[0])
    e = float(cmap.cmap_energy(jnp.asarray(pos), jnp.asarray(box),
                               jnp.asarray(atoms8), jnp.zeros(1, jnp.int32),
                               jnp.asarray(coeffs), jnp.asarray(res)))
    assert abs(e - (np.cos(phi) + np.sin(psi))) < 5e-5, (e, phi, psi)


def test_cmap_autodiff_force_matches_analytic():
    """jax.grad through the bicubic equals the analytic chain-rule force
    dE = -sin(phi) dphi + cos(psi) dpsi with dphi/dx from autodiff of the
    shared dihedral function (validating the spline-derivative path)."""
    R = 24
    ang = -np.pi + 2 * np.pi * np.arange(R) / R
    grid = np.cos(ang)[:, None] + np.sin(ang)[None, :]
    coeffs, res = cmap.pack_cmap_maps([grid])
    pos, box, atoms8 = _pentane_like()
    pos_j = jnp.asarray(pos)
    box_j = jnp.asarray(box)
    at = jnp.asarray(atoms8)

    g_map = jax.grad(lambda p: cmap.cmap_energy(
        p, box_j, at, jnp.zeros(1, jnp.int32), jnp.asarray(coeffs),
        jnp.asarray(res)))(pos_j)
    g_exact = jax.grad(lambda p: (
        jnp.cos(_dihedral_angle(p, box_j, at[:, :4]))
        + jnp.sin(_dihedral_angle(p, box_j, at[:, 4:])))[0])(pos_j)
    scale = float(jnp.abs(g_exact).max())
    np.testing.assert_allclose(np.asarray(g_map), np.asarray(g_exact),
                               atol=2e-3 * scale)


def test_cmap_prm_parse_and_canonical_key(tmp_path):
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    R = 4
    vals = np.arange(R * R, dtype=float) * 0.25
    lines = ["CMAP", "CA CB CC CD CE CF CG CH 4"]
    for r in range(R):
        lines.append(" ".join(f"{v:.3f}" for v in vals[r * R:(r + 1) * R]))
    lines += ["", "END"]
    p = tmp_path / "cmap.prm"
    p.write_text("\n".join(lines) + "\n")
    prm = CharmmParameterSet(str(p))
    res, grid = prm.cmap("CA", "CB", "CC", "CD", "CE", "CF", "CG", "CH")
    assert res == R
    np.testing.assert_allclose(grid, vals.reshape(R, R))
    # reversed halves resolve to the same map (per-dihedral min key)
    res2, grid2 = prm.cmap("CD", "CC", "CB", "CA", "CH", "CG", "CF", "CE")
    np.testing.assert_allclose(grid2, grid)
    with pytest.raises(KeyError):
        prm.cmap("CA", "CB", "CC", "CD", "CE", "CF", "CG", "ZZ")


@pytest.mark.skipif(not os.path.isdir(MODELS), reason="reference data absent")
def test_cmap_full_pipeline_constant_map(tmp_path):
    """End-to-end PSF+PRM -> System -> energy_forces: a constant map of
    E0 kcal/mol over two cross-terms contributes exactly 2*E0*4.184 kJ/mol
    and exactly zero force, independent of geometry."""
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.forces import ForceEvaluator

    psf_text = open(MODEL + "topol.psf").read()
    psf_text += "\n       2 !NCRTERM: cross-terms\n" \
        "       1       2       3       4       3       4       5       6\n" \
        "       1       2       3       4       3       4       5       6\n"
    psf_p = tmp_path / "topol.psf"
    psf_p.write_text(psf_text)

    psf_probe = OplsPsfFile(str(psf_p))
    types8 = [psf_probe.topology.atom_types[a]
              for a in psf_probe.cmaps[0]]
    E0 = 1.75
    R = 4
    prm_text = open(MODEL + "ff.prm").read()
    cmap_lines = ["", "CMAP", " ".join(types8) + f" {R}"]
    for _ in range(R):
        cmap_lines.append(" ".join([f"{E0:.4f}"] * R))
    prm_p = tmp_path / "ff.prm"
    prm_p.write_text(prm_text + "\n".join(cmap_lines) + "\n")

    gro = GroFile(MODEL + "conf.gro")
    psf = OplsPsfFile(str(psf_p),
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(str(prm_p))
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    s = built.system
    assert s.cmap_atoms.shape == (2, 8)
    assert s.cmap_coeffs.shape[0] == 1          # identical grids deduped
    ev = ForceEvaluator(s, box_hint=np.asarray(gro.box),
                        pos_hint=np.asarray(gro.positions))
    pos = jnp.asarray(gro.positions, jnp.float32)
    box = jnp.asarray(gro.box, jnp.float32)
    terms, _ = ev.energy_forces(pos, box)
    np.testing.assert_allclose(float(terms["cmap"]), 2 * E0 * 4.184,
                               rtol=1e-5)
    g = jax.grad(lambda p: cmap.cmap_energy(
        p, box, s.cmap_atoms, s.cmap_map, s.cmap_coeffs, s.cmap_res))(pos)
    # flat map -> zero force up to f32 coefficient rounding (real bonded
    # forces are O(10^2-10^3) kJ/mol/nm; 1e-9 is twelve orders below)
    assert float(jnp.abs(g).max()) < 1e-9
