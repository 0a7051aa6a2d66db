"""Loader tests against the bundled reference model data (read-only fixtures
at /root/reference/examples/models)."""
import os

import numpy as np
import pytest

from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

MODEL = "/root/reference/examples/models/bulk_Im21/"
pytestmark = pytest.mark.skipif(not os.path.isdir(MODEL),
                                reason="reference models not mounted")


def test_grofile_read():
    gro = GroFile(MODEL + "conf.gro")
    assert gro.positions.shape == (9250, 3)
    np.testing.assert_allclose(gro.box, [3.1, 3.1, 6.1])
    # first atom from conf.gro line 3
    np.testing.assert_allclose(gro.positions[0], [0.592, 1.322, 0.473])
    assert gro.residue_names[0] == "c2c1i"


def test_grofile_roundtrip(tmp_path):
    gro = GroFile(MODEL + "conf.gro")
    out = tmp_path / "out.gro"
    GroFile.writeFile(gro, gro.positions, gro.box, str(out), time=1.0)
    back = GroFile(str(out))
    np.testing.assert_allclose(back.positions, np.round(gro.positions, 3),
                               atol=5e-4)
    np.testing.assert_allclose(back.box, gro.box)


def test_prm_parse():
    prm = CharmmParameterSet(MODEL + "ff.prm")
    # BONDS: NA CR 477.055449 1.3150
    k, r0 = prm.bond("NA", "CR")
    assert abs(k - 477.055449) < 1e-6 and abs(r0 - 1.315) < 1e-9
    # ANGLES: CR NA C1 70.004780 126.4
    (ka, th0), ub = prm.angle("CR", "NA", "C1")
    assert abs(ka - 70.00478) < 1e-5 and abs(th0 - 126.4) < 1e-9
    assert ub is None
    # DIHEDRALS multi-lookup + NONBONDED
    terms = prm.dihedral("C1", "NA", "CR", "NA")
    assert terms[0][1] == 2 and abs(terms[0][0] - 2.325526) < 1e-6
    at = prm.atom_types["NA"]
    assert abs(at.epsilon - 0.12138) < 1e-6
    assert abs(at.rmin_half - 1.796641) < 1e-6
    # NBFIX pair Rmin is the full pair distance
    eps, rmin, _, _ = at.nbfix["CR"]
    assert abs(rmin - 3.755465) < 1e-6


def test_psf_parse_counts():
    gro = GroFile(MODEL + "conf.gro")
    psf = OplsPsfFile(MODEL + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    assert psf.topology.n_atoms == 9250
    # 9000 PSF bonds = 5750 real + 3250 Drude pairs (name 'D...')
    assert len(psf.bonds) + len(psf.drude_pair_list) == 9000
    assert len(psf.drude_pair_list) == 3250
    assert len(psf.angles) == 9000
    assert len(psf.dihedrals) == 10750
    assert len(psf.impropers) == 1250
    # Drude constants from the atom lines: N1 alpha -1.208, thole 0.9
    np.testing.assert_allclose(psf.drudeconsts[0], [-1.208, 0.9])
    # all Drude pairs have parent = drude-1 (CHARMM ordering)
    pairs = np.asarray(psf.drude_pair_list)
    np.testing.assert_array_equal(pairs[:, 1], pairs[:, 0] + 1)


def test_create_system_bookkeeping():
    gro = GroFile(MODEL + "conf.gro")
    psf = OplsPsfFile(MODEL + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(MODEL + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds")
    s = built.system
    assert s.n_atoms == 9250
    assert s.n_molecules == 500          # 250 cations + 250 anions
    assert s.drude_pairs.shape[0] == 3250
    # every H participates in exactly one constraint (H mass 1.008; Drude
    # particles are 0.4 and are not constrained)
    masses = np.asarray(s.masses)
    n_h = int(np.sum((masses > 0.9) & (masses < 3.5)))
    assert s.constraints.shape[0] == n_h == 2750
    # charges sum to ~0
    assert abs(float(np.sum(np.asarray(s.charges)))) < 1e-3
    # Drude spring constants: k = C q^2/alpha for isotropic particles
    from openmm_velocityverlet_tpu.units import ONE_4PI_EPS0
    q = np.asarray(s.charges)[np.asarray(s.drude_pairs)[:, 0]]
    alpha = -psf.drudeconsts[np.asarray(s.drude_pairs)[:, 1], 0] / 1000.0
    np.testing.assert_allclose(np.asarray(s.drude_k3),
                               ONE_4PI_EPS0 * q * q / alpha, rtol=1e-4)


def test_psf_cmap_terms_parse(tmp_path):
    """CMAP cross-terms (oplspsffile.py:430-465): NCRTERM parses into
    8-index tuples (0-based), two dihedrals per term."""
    text = open(MODEL + "topol.psf").read()
    text += "\n       2 !NCRTERM: cross-terms\n" \
            "       1       2       3       4       3       4       5       6\n" \
            "       5       6       7       8       7       8       9      10\n"
    p = tmp_path / "cmap.psf"
    p.write_text(text)
    psf = OplsPsfFile(str(p))
    assert psf.cmaps == [(0, 1, 2, 3, 2, 3, 4, 5),
                         (4, 5, 6, 7, 6, 7, 8, 9)]


def test_grofile_triclinic_raises(tmp_path):
    """Only orthorhombic boxes are supported (utils/pbc.py); a gro file
    with off-diagonal box vectors must raise, not silently truncate."""
    p = tmp_path / "tri.gro"
    p.write_text("tri\n 1\n    1MOL     C1    1   0.000   0.000   0.000\n"
                 "   3.0   3.0   3.0   0.0   0.0   0.5   0.0   0.0   0.0\n")
    with pytest.raises(ValueError, match="triclinic"):
        GroFile(str(p))
