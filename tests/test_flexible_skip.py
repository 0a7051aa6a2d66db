"""Force-path skip of constraint-null spring terms.

flexibleConstraints=True (the reference default, oplspsffile.py:1000-1008)
keeps spring terms on constrained coordinates for energy-reporting parity.
Those springs act only along directions the constraint solver projects away,
so the MD step's force path drops them (ForceEvaluator.term_tables_force) —
these tests lock (a) the classification, (b) the exact-dynamics claim, and
(c) untouched energy reporting.
"""
import numpy as np
import pytest

from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.forces import (ForceEvaluator,
                                              _drop_constraint_null_terms)
from openmm_velocityverlet_tpu.models.builder import SystemBuilder


def make_constrained_fluid(n_mol=8, rigid_triangle=True):
    """Diatomics with spring+constraint on the bond, plus one water-like
    rigid triangle (2 bond springs + 1 angle spring, 3 constraints)."""
    b = SystemBuilder()
    rng = np.random.default_rng(3)
    pos = []
    for _ in range(n_mol):
        i = b.add_particle(12.0, lj_type=0)
        j = b.add_particle(1.0, lj_type=0)
        b.add_bond(i, j, 0.1, 250000.0)     # spring on a constrained pair
        b.add_constraint(i, j, 0.1)
        b.add_exclusion(i, j)
        base = rng.uniform(0.4, 2.6, 3)
        pos += [base, base + (0.1, 0, 0)]
    if rigid_triangle:
        o = b.add_particle(16.0, lj_type=0)
        h1 = b.add_particle(1.0, lj_type=0)
        h2 = b.add_particle(1.0, lj_type=0)
        th = 1.82421813418
        b.add_bond(o, h1, 0.09572, 400000.0)
        b.add_bond(o, h2, 0.09572, 400000.0)
        b.add_angle(h1, o, h2, th, 300.0)
        dhh = 0.09572 * np.sqrt(2 - 2 * np.cos(th))
        b.add_constraint(o, h1, 0.09572)
        b.add_constraint(o, h2, 0.09572)
        b.add_constraint(h1, h2, dhh)
        for a, c in ((o, h1), (o, h2), (h1, h2)):
            b.add_exclusion(a, c)
        base = np.array([1.5, 1.5, 1.5])
        pos += [base,
                base + (0.09572, 0.0, 0.0),
                base + (np.cos(th) * 0.09572, np.sin(th) * 0.09572, 0.0)]
    b.set_lj_from_type_params([0.3], [0.4])
    box = np.array([3.0] * 3)
    return b.finalize(box, r_cutoff=1.0, use_pme=False), np.array(pos), box


def test_classification_drops_exactly_the_null_terms():
    system, _, _ = make_constrained_fluid()
    fsys = _drop_constraint_null_terms(system)
    assert fsys is not None
    # all diatomic bond springs + both water OH springs are constraint-null;
    # the HOH angle is inside the rigid triangle
    assert fsys.bonds.shape[0] == 0
    assert fsys.angles.shape[0] == 0
    # a system with constraints but no springs on them reports None
    b = SystemBuilder()
    i = b.add_particle(12.0, lj_type=0)
    j = b.add_particle(1.0, lj_type=0)
    b.add_constraint(i, j, 0.1)
    b.add_exclusion(i, j)
    b.set_lj_from_type_params([0.3], [0.4])
    s2 = b.finalize(np.array([3.0] * 3), r_cutoff=1.0, use_pme=False)
    assert _drop_constraint_null_terms(s2) is None


def test_partially_constrained_angle_is_kept():
    """An angle whose flanking bonds are constrained but whose 1-3 distance
    is free bends dynamically — its spring must survive the force path."""
    b = SystemBuilder()
    a1 = b.add_particle(12.0, lj_type=0)
    a2 = b.add_particle(12.0, lj_type=0)
    a3 = b.add_particle(12.0, lj_type=0)
    b.add_bond(a1, a2, 0.15, 200000.0)
    b.add_bond(a2, a3, 0.15, 200000.0)
    b.add_angle(a1, a2, a3, 1.9, 500.0)
    b.add_constraint(a1, a2, 0.15)
    b.add_constraint(a2, a3, 0.15)
    for x, y in ((a1, a2), (a2, a3), (a1, a3)):
        b.add_exclusion(x, y)
    b.set_lj_from_type_params([0.3], [0.4])
    s = b.finalize(np.array([3.0] * 3), r_cutoff=1.0, use_pme=False)
    fsys = _drop_constraint_null_terms(s)
    assert fsys is not None
    assert fsys.bonds.shape[0] == 0       # both constrained springs dropped
    assert fsys.angles.shape[0] == 1      # bending DOF is free -> kept


def run_traj(system, pos, box, steps, disable_skip):
    integ = VVIntegrator(temperature=300.0, step_size=0.001)
    ctx = Context(system, integ, positions=pos, box=box)
    if disable_skip:
        ctx.evaluator.term_tables_force = ctx.evaluator.term_tables
        ctx.evaluator.mol_types_force = ctx.evaluator.mol_types
        ctx._compiled.clear()
    rng = np.random.default_rng(11)
    vel = rng.normal(size=pos.shape).astype(np.float32) * 0.3
    ctx.set_velocities(vel)
    ctx.step(steps)
    return ctx.get_positions(), ctx.get_velocities()


def test_dynamics_identical_with_and_without_skip():
    """RATTLE projects the (along-constraint) spring forces away exactly, so
    trajectories with and without the null springs must agree to fp noise."""
    system, pos, box = make_constrained_fluid()
    p1, v1 = run_traj(system, pos, box, 40, disable_skip=False)
    p2, v2 = run_traj(system, pos, box, 40, disable_skip=True)
    np.testing.assert_allclose(p1, p2, rtol=0, atol=5e-5)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=5e-3)


def test_energy_reporting_keeps_full_tables():
    system, pos, box = make_constrained_fluid()
    ev = ForceEvaluator(system)
    import jax.numpy as jnp
    # displace so springs are off their minima: reported bond energy must
    # include the constrained springs (flexibleConstraints parity)
    rng = np.random.default_rng(5)
    pshift = pos + rng.normal(size=pos.shape) * 0.004
    terms, _ = ev.energy_forces(jnp.asarray(pshift, jnp.float32),
                                jnp.asarray(box, jnp.float32))
    e_bond_full = float(terms["bond"])
    assert e_bond_full > 1.0  # springs visibly strained
    # while the force path evaluates the filtered tables
    assert (ev.term_tables_force is not ev.term_tables
            or ev.mol_types_force is not ev.mol_types)
