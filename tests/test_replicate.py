"""Replicating a periodic box k-fold multiplies every energy term by k and
preserves per-atom forces (copy 0 of the replica matches the original)."""
import numpy as np

from openmm_velocityverlet_tpu.forces import ForceEvaluator
from openmm_velocityverlet_tpu.models.replicate import replicate
from tests.test_smoke import make_lj_fluid


def _charged_fluid():
    system, pos, box = make_lj_fluid(n_side=3)
    # alternate +/- charges so Ewald terms are exercised
    n = system.n_atoms
    q = np.where(np.arange(n) % 2 == 0, 0.2, -0.2).astype(np.float32)
    from openmm_velocityverlet_tpu.ops.ewald import ewald_parameters
    beta, kmax = ewald_parameters(system.r_cutoff, 5e-4, box)
    system = system.replace(charges=q, ewald_beta=float(beta),
                            kmax=tuple(kmax))
    return system, pos, box


def test_replicate_energy_and_forces():
    system, pos, box = _charged_fluid()
    ev1 = ForceEvaluator(system, pair_kernel="dense")
    t1, f1 = ev1.energy_forces(np.asarray(pos), np.asarray(box))
    e1 = {k: float(v) for k, v in t1.items()}

    rsys, rpos, rbox = replicate(system, pos, box, (1, 2, 2))
    assert rsys.n_atoms == 4 * system.n_atoms
    ev4 = ForceEvaluator(rsys, pair_kernel="dense")
    t4, f4 = ev4.energy_forces(rpos, rbox)
    e4 = {k: float(v) for k, v in t4.items()}

    for k in e1:
        if k == "coul_recip":
            # k-space discretization differs slightly between the boxes
            assert abs(e4[k] - 4 * e1[k]) < 5e-3 * max(abs(e1[k]), 1.0), k
        else:
            np.testing.assert_allclose(e4[k], 4 * e1[k], rtol=2e-4, err_msg=k)
    # forces on copy 0 match the original system's forces
    np.testing.assert_allclose(np.asarray(f4)[:system.n_atoms],
                               np.asarray(f1), rtol=2e-3, atol=2e-2)


def test_replicate_preserves_topology_counts():
    system, pos, box = _charged_fluid()
    rsys, rpos, rbox = replicate(system, pos, box, (2, 1, 1))
    assert rsys.bonds.shape[0] == 2 * system.bonds.shape[0]
    assert rsys.n_molecules == 2 * system.n_molecules
    assert float(rsys.disp_coef_b) == 4 * float(system.disp_coef_b)
    # molecule table indices of the second copy point into the second block
    mt = np.asarray(rsys.mol_table)
    second = mt[system.n_molecules:]
    assert (second[second >= 0] >= system.n_atoms).all()
