"""The hand-derived analytic term forces must equal -grad of the term
energies (autodiff of the same module's energy expressions is an independent
check on the hand-written gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_velocityverlet_tpu.models.builder import SystemBuilder
from openmm_velocityverlet_tpu.ops import term_forces


def _rich_system():
    """One of every term type, with non-trivial geometry."""
    b = SystemBuilder()
    rng = np.random.RandomState(7)
    for i in range(12):
        b.add_particle(12.0 if i % 4 else 0.4, charge=0.1 * (-1) ** i,
                       lj_type=0)
    b.set_lj_from_type_params([0.3], [0.5])
    b.add_bond(0, 1, 0.15, 200000.0)
    b.add_urey_bradley(0, 2, 0.24, 30000.0)
    b.add_angle(0, 1, 2, 1.9, 400.0)
    b.add_dihedral(0, 1, 2, 3, 3.0, 0.4, 8.0)
    b.add_improper(1, 2, 0, 3, 12.0)
    b.add_exception(0, 3, 0.01, 0.3, 0.4)
    # isotropic Drude pair (4 on parent 5) and anisotropic (6 on parent 7)
    b.add_drude(4, 5, -1, -1, -1, -1.1, 1.0e-3, 1.0, 1.0)
    b.add_drude(6, 7, 5, 8, 9, -1.0, 1.2e-3, 0.8, 1.1)
    b.add_thole_pair(4, 5, 6, 7, -1.1, -1.0, 2.6, 1.0e-3, 1.2e-3)
    sys_ = b.finalize(box=[3.0, 3.2, 3.4], use_pme=False)
    pos = rng.uniform(0.4, 2.4, (12, 3)).astype(np.float32)
    # keep bonded partners close so minimum-image terms are smooth
    base = pos[0]
    for i in range(1, 12):
        pos[i] = base + 0.22 * rng.standard_normal(3)
    return sys_, jnp.asarray(pos), jnp.asarray([3.0, 3.2, 3.4], jnp.float32)


def test_analytic_forces_match_autodiff():
    system, pos, box = _rich_system()
    terms, inc, slots = term_forces.build_term_tables(system)

    def total_e(p):
        es, _ = term_forces.energies_and_forces(p, box, terms, inc, slots)
        return sum(es.values())

    _, forces = term_forces.energies_and_forces(pos, box, terms, inc, slots)
    grad = jax.grad(total_e)(pos)
    np.testing.assert_allclose(np.asarray(forces), -np.asarray(grad),
                               rtol=2e-3, atol=5e-2)


def test_energy_components_present():
    system, pos, box = _rich_system()
    terms, inc, slots = term_forces.build_term_tables(system)
    es, _ = term_forces.energies_and_forces(pos, box, terms, inc, slots)
    for key in ("bond", "urey_bradley", "angle", "dihedral", "improper",
                "drude", "thole", "exception_coul", "exception_lj"):
        assert key in es and np.isfinite(float(es[key])), key


def test_forces_sum_to_zero():
    """Internal forces of an isolated cluster must sum to zero (translation
    invariance of every term)."""
    system, pos, box = _rich_system()
    terms, inc, slots = term_forces.build_term_tables(system)
    _, forces = term_forces.energies_and_forces(pos, box, terms, inc, slots)
    np.testing.assert_allclose(np.asarray(forces).sum(0),
                               np.zeros(3), atol=1e-2)
