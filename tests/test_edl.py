"""Integration test of the constant-voltage EDL toolbox on a synthetic slab:
image charges + mirror sync, applied field, partitioned Langevin (electrode)
+ TGNH (liquid), electrode restraints and a Drude z-wall — the full
run-edl.py wiring (reference run-edl.py:36-100) in one small system."""
import os
import sys

import numpy as np
import pytest

from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator
from openmm_velocityverlet_tpu.ops import external


def build_edl(n_elec=16, n_ion_pairs=10):
    b = SystemBuilder()
    lz = 6.0
    box = np.array([2.0, 2.0, lz])
    rng = np.random.default_rng(5)
    pos = []

    # electrode: 4x4 slab at z ~ 0.2, Langevin-thermostated + restrained
    elec = []
    for ix in range(4):
        for iy in range(4):
            i = b.add_particle(95.0, charge=0.0, lj_type=0)
            elec.append(i)
            pos.append([0.25 + 0.5 * ix, 0.25 + 0.5 * iy, 0.2])

    # electrolyte: monatomic +/- ions, cations polarizable (Drude)
    ils, drudes, cations, anions = [], [], [], []
    alpha = 1e-3
    for m in range(n_ion_pairs):
        c = b.add_particle(39.0, charge=1.8, lj_type=1)
        d = b.add_particle(0.4, charge=-0.8, lj_type=2)
        b.add_drude(d, c, -1, -1, -1, -0.8, alpha, 0.0, 0.0)
        b.add_exclusion(c, d)
        a = b.add_particle(35.0, charge=-1.0, lj_type=1)
        ils += [c, d, a]
        drudes.append(d)
        cations.append(c)
        anions.append(a)
        # grid placement avoids initial overlaps
        gx, gy = divmod(m, 4)
        pos.append([0.2 + 0.45 * gy, 0.3 + 0.6 * gx, 1.0 + 0.25 * (m % 5)])
        # drude slightly displaced from its parent (like real data)
        pos.append([pos[-1][0] + 1e-3, pos[-1][1], pos[-1][2]])
        pos.append([0.45 + 0.45 * gy, 0.6 + 0.6 * gx, 1.4 + 0.22 * (m % 5)])

    # image particles: mirrored charges, no LJ, no dynamics of their own
    # (massless: the mirror sync owns their positions)
    image_pairs = []
    for p in ils:
        img = b.add_particle(0.0, charge=0.0, lj_type=3)
        image_pairs.append((p, img))
        pz = pos[p][2]
        pos.append([pos[p][0], pos[p][1], lz - pz])
    b.set_lj_from_type_params([0.3, 0.35, 0.1, 0.1],
                              [0.6, 0.4, 0.0, 0.0])
    # q_img = -q_parent (run-edl.py:54-58)
    for p, img in image_pairs:
        b.charges[img] = -b.charges[p]
        b.extra_molecule_links.append((p, img))
    # LJ groups: drop img<->img and img<->electrode (run-edl.py:60-62)
    groups = np.zeros(len(b.masses), np.int32)
    for p, img in image_pairs:
        groups[img] = 1
    for i in elec:
        groups[i] = 2
    allowed = np.zeros((3, 3), bool)
    for gi, gj in [(0, 0), (0, 2), (2, 2), (1, 0)]:
        allowed[gi, gj] = allowed[gj, gi] = True
    b.lj_group = groups
    b.lj_group_allowed = allowed

    pos = np.asarray(pos)
    system = b.finalize(box, r_cutoff=0.9, use_pme=True)
    return (system, pos, box, lz, elec, ils, drudes, image_pairs)


def test_edl_full_wiring():
    system, pos, box, lz, elec, ils, drudes, image_pairs = build_edl()
    restraint = external.spring_self(elec, pos, [400.0, 400.0, 2000.0])
    wall = external.wall_lj126(drudes, 2, (0.0, lz / 2),
                               epsilon=2.0, sigma=0.15)

    voltage = 2.0
    integ = VVIntegrator(300.0, 10.0, 1.0, 40.0, 0.001)
    integ.setMaxDrudeDistance(0.02)
    for i in elec:
        integ.addParticleLangevin(i)
    integ.setMirrorLocation(lz / 2)
    for parent, image in image_pairs:
        integ.addImagePair(image, parent)
    integ.setElectricField(voltage / lz * 2)
    for i in ils:
        integ.addParticleElectrolyte(i)

    ctx = Context(system, integ, positions=pos, box=box,
                  external_forces=[restraint, wall])
    ctx.set_velocities_to_temperature(300.0)
    assert ctx.data.ld_normal.shape[0] == len(elec)
    assert ctx.data.image_pairs.shape[0] == len(image_pairs)
    ctx.step(300)

    p = ctx.get_positions()
    assert np.all(np.isfinite(p))
    # image positions mirror their parents exactly (imageCharge.cu:14-26)
    pairs = np.asarray(ctx.data.image_pairs)
    img, par = pairs[:, 0], pairs[:, 1]
    np.testing.assert_allclose(p[img, 0], p[par, 0], atol=1e-5)
    np.testing.assert_allclose(p[img, 1], p[par, 1], atol=1e-5)
    np.testing.assert_allclose(p[img, 2], lz - p[par, 2], atol=1e-5)
    # electrode stays put under the restraint
    assert np.abs(p[elec, 2] - 0.2).max() < 0.2
    # Drude particles respect the z-wall (small tunneling tolerance)
    assert p[drudes, 2].max() < lz / 2 + 0.05
    # energy stays finite and the field term is active
    terms = ctx.potential_energy_terms()
    assert all(np.isfinite(v) for v in terms.values())


def test_mirror_image_exclusions():
    """Image particles inherit their parents' exclusion/exception structure
    (the image of a Drude sits ~0.01 nm from the image of its parent; bare
    Coulomb there is ~1e8 kJ/mol of spurious energy)."""
    from openmm_velocityverlet_tpu.models.helper import (
        mirror_image_exclusions)

    class B:
        pass

    class Built:
        pass
    built = Built()
    b = B()
    b.exclusions = {(0, 1), (0, 2)}
    b.exceptions = {(1, 2): (0.25, 0.3, 0.5)}
    added_exc = []
    added_exn = []
    b.add_exclusion = lambda i, j: added_exc.append((i, j))
    b.add_exception = lambda i, j, qq, s, e: added_exn.append(
        (i, j, qq, s, e))
    built.builder = b
    # parents 0,1,2 -> images 10,11,12
    mirror_image_exclusions(built, [(0, 10), (1, 11), (2, 12)])
    assert set(added_exc) == {(10, 11), (10, 12)}
    assert added_exn == [(11, 12, 0.25, 0.1, 0.0)]


@pytest.mark.parametrize("mesh_devices", [0, 2])
def test_synthesized_edl_model_runs(mesh_devices, tmp_path):
    """The EDL model generator (tools/make_edl_model.py) produces a
    gro/psf/prm triple that run-edl.py's builder consumes: finite group
    energies and exact image mirroring after real dynamics steps.
    mesh_devices=2 drives the same wiring through the public multi-chip
    path (Context(mesh=...), incl. ghost padding of the odd atom count)."""
    import importlib.util
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if True:
        td = str(tmp_path)
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "make_edl_model.py"),
             td, "40"], check=True, env={**os.environ,
                                         "JAX_PLATFORMS": "cpu"})
        spec = importlib.util.spec_from_file_location(
            "runedl", os.path.join(repo, "examples", "run-edl.py"))
        runedl = importlib.util.module_from_spec(spec)
        argv0 = sys.argv
        sys.argv = ["run-edl.py"]
        cwd = os.getcwd()
        os.chdir(td)
        kwargs = {}
        if mesh_devices:
            import jax
            from openmm_velocityverlet_tpu.parallel.mesh import make_mesh
            kwargs["mesh"] = make_mesh(jax.devices()[:mesh_devices])
        try:
            spec.loader.exec_module(runedl)
            sim = runedl.gen_simulation(
                os.path.join(td, "conf.gro"), os.path.join(td, "topol.psf"),
                os.path.join(td, "ff.prm"), voltage=1.0, **kwargs)
        finally:
            sys.argv = argv0
            os.chdir(cwd)
        ctx = sim.context
        # the image molecule-links must NOT disable the dense bonded path:
        # term batching groups by term-graph connectivity, so both liquid
        # species batch even though their thermostat molecules include the
        # (non-contiguous) image particles
        batched = {(t.apm, t.n_mol) for t in ctx.evaluator.mol_types}
        # the tiny generator takes the first nres residues = 2x40 cations
        assert (27, 80) in batched, batched
        terms = ctx.potential_energy_terms()
        assert all(np.isfinite(v) for v in terms.values()), terms
        # image exclusion mirroring keeps the Coulomb scale physical
        assert abs(terms["coul_direct"]) < 1e6, terms["coul_direct"]
        ctx.set_velocities_to_temperature(333.0)
        ctx.step(20)
        pos = np.asarray(ctx.state.pos)
        pairs = np.asarray(ctx.data.image_pairs)
        mirror = ctx.data.mirror_location
        np.testing.assert_allclose(
            pos[pairs[:, 0], 2], 2 * mirror - pos[pairs[:, 1], 2], atol=1e-4)
        np.testing.assert_allclose(pos[pairs[:, 0], :2],
                                   pos[pairs[:, 1], :2], atol=1e-4)
        assert np.isfinite(ctx.kinetic_energy())
