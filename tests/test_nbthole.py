"""NBTHOLE screened-dipole interaction (reference oplspsffile.py:1350-1405):
analytic two-dipole check at the builder level plus the full PSF/PRM path
(createSystem must build the tables instead of raising)."""
import math
import os

import numpy as np
import pytest

from openmm_velocityverlet_tpu.models.builder import SystemBuilder
from openmm_velocityverlet_tpu.ops import nonbonded
from openmm_velocityverlet_tpu.units import ONE_4PI_EPS0


def _analytic_pair(q1, q2, r, screen):
    sr = screen * r
    return -ONE_4PI_EPS0 * q1 * q2 * (1.0 + 0.5 * sr) * math.exp(-sr) / r


def test_nbthole_two_dipoles_analytic():
    """Two Drude dipoles of different NBTHOLE types: 4 site-site terms with
    the screen coef * (a1 a2)^(-1/6) * 10, exclusions respected."""
    b = SystemBuilder()
    # dipole A: parent 0 (+1.2), drude 1 (-1.2); dipole B: parent 2, drude 3
    b.add_particle(14.0, charge=1.2, lj_type=0)
    b.add_particle(0.4, charge=-1.2, lj_type=0)
    b.add_particle(12.0, charge=0.9, lj_type=0)
    b.add_particle(0.4, charge=-0.9, lj_type=0)
    b.set_lj_from_type_params([0.3], [0.0])
    b.add_drude(1, 0, -1, -1, -1, -1.2, 1.0e-3, 1.0, 1.0)
    b.add_drude(3, 2, -1, -1, -1, -0.9, 1.5e-3, 1.0, 1.0)
    b.add_exclusion(0, 1)
    b.add_exclusion(2, 3)
    alpha1_A3 = 1.0   # Angstrom^3 (PSF drude alpha magnitudes)
    alpha2_A3 = 1.5
    a_thole = 2.6
    nbt_idx = [1, 1, 2, 2]
    nbt_alpha = [alpha1_A3 ** (-1 / 6), alpha1_A3 ** (-1 / 6),
                 alpha2_A3 ** (-1 / 6), alpha2_A3 ** (-1 / 6)]
    coef = np.zeros((3, 3))
    coef[1, 2] = coef[2, 1] = a_thole
    b.set_nbthole(nbt_idx, nbt_alpha, coef)
    box = np.array([5.0, 5.0, 5.0])
    system = b.finalize(box, r_cutoff=1.2, use_pme=False)

    pos = np.array([[1.0, 1.0, 1.0], [1.02, 1.0, 1.0],
                    [1.5, 1.0, 1.0], [1.53, 1.0, 1.0]], np.float32)
    e = float(nonbonded.nbthole_energy(
        pos, np.asarray(box, np.float32), system.nbt_idx, system.nbt_alpha,
        system.nbt_coef, system.charges, system.exclusions, 1.2))

    screen = a_thole * (alpha1_A3 * alpha2_A3) ** (-1 / 6) * 10.0
    expect = 0.0
    for i, qi in ((0, 1.2), (1, -1.2)):
        for j, qj in ((2, 0.9), (3, -0.9)):
            r = float(np.linalg.norm(pos[i] - pos[j]))
            expect += _analytic_pair(qi, qj, r, screen)
    np.testing.assert_allclose(e, expect, rtol=1e-5)


def test_nbthole_same_type_and_exclusions_inert():
    """Same-type pairs and excluded pairs must not interact."""
    b = SystemBuilder()
    for q in (1.0, -1.0, 1.0, -1.0):
        b.add_particle(10.0, charge=q, lj_type=0)
    b.set_lj_from_type_params([0.3], [0.0])
    b.add_exclusion(0, 2)
    b.set_nbthole([1, 1, 1, 1], [1.0] * 4, np.array([[0, 0], [0, 2.6]]))
    box = np.array([5.0, 5.0, 5.0])
    system = b.finalize(box, r_cutoff=1.2, use_pme=False)
    pos = np.array([[1, 1, 1], [1.3, 1, 1], [1.6, 1, 1], [1.9, 1, 1]],
                   np.float32)
    e = float(nonbonded.nbthole_energy(
        pos, np.asarray(box, np.float32), system.nbt_idx, system.nbt_alpha,
        system.nbt_coef, system.charges, system.exclusions, 1.2))
    assert e == 0.0


def _write_nbthole_fixture(tmpdir):
    """Minimal 2-dipole PSF/PRM pair with an NBTHOLE section."""
    psf = """PSF DRUDE

       1 !NTITLE
 REMARKS synthetic NBTHOLE fixture

       4 !NATOM
      1  S     1   molA         N1       TA   2.200000  14.0070    0  -1.0000   0.9000
      2  S     1   molA         DP1      DP_  -1.000000   0.4000    0  -0.0000   0.0000
      3  S     2   molB         C1       TB   1.900000  12.0110    0  -1.5000   0.9000
      4  S     2   molB         DP2      DP_  -1.000000   0.4000    0  -0.0000   0.0000

       2 !NBOND: bonds
       1       2       3       4

       0 !NTHETA: angles

       0 !NPHI: dihedrals

       0 !NIMPHI: impropers
"""
    prm = """* synthetic NBTHOLE fixture
*

ATOMS
  MASS      1         TA    14.0070
  MASS      2         TB    12.0110
  MASS      3        DP_     0.0000

BONDS
        TA         DP_      500.0     0.0
        TB         DP_      500.0     0.0

NONBONDED
        TA       0.0  -0.10     1.6
        TB       0.0  -0.12     1.7
        DP_      0.0  -0.00     0.0

NBTHOLE
        TA   TB   2.6

END
"""
    psf_path = os.path.join(tmpdir, "nbt.psf")
    prm_path = os.path.join(tmpdir, "nbt.prm")
    open(psf_path, "w").write(psf)
    open(prm_path, "w").write(prm)
    return psf_path, prm_path


def test_nbthole_via_psf_createsystem(tmp_path):
    """createSystem with NBTHOLE parameters builds the tables (round-1
    VERDICT item 4: psffile.py previously raised NotImplementedError)."""
    from openmm_velocityverlet_tpu.forces import ForceEvaluator
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

    psf_path, prm_path = _write_nbthole_fixture(str(tmp_path))
    box = np.array([5.0, 5.0, 5.0])
    psf = OplsPsfFile(psf_path, periodicBoxVectors=np.diag(box))
    prm = CharmmParameterSet(prm_path)
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints=None,
                             rigidWater=False)
    s = built.system
    assert int(np.asarray(s.nbt_idx).max()) == 2
    # parent and its drude share the type id
    assert s.nbt_idx[0] == s.nbt_idx[1] == 1
    assert s.nbt_idx[2] == s.nbt_idx[3] == 2
    np.testing.assert_allclose(float(s.nbt_coef[1, 2]), 2.6)
    np.testing.assert_allclose(float(s.nbt_alpha[0]), 1.0 ** (-1 / 6),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s.nbt_alpha[2]), 1.5 ** (-1 / 6),
                               rtol=1e-6)

    # energies evaluate with the nbthole term present and force balance holds
    ev = ForceEvaluator(s, pair_kernel="dense")
    pos = np.array([[1.0, 1.0, 1.0], [1.02, 1.0, 1.0],
                    [1.5, 1.0, 1.0], [1.53, 1.0, 1.0]], np.float32)
    terms, f = ev.energy_forces(pos, np.asarray(box, np.float32))
    assert "nbthole" in terms and np.isfinite(float(terms["nbthole"]))
    assert float(terms["nbthole"]) != 0.0
    np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-3)
