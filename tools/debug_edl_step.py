#!/usr/bin/env python3
"""Feature-bisect the EDL-scale fused-step TPU fault.

Builds the real edl_Im21 system exactly like examples/run-edl.py but enables
integrator/step features incrementally; runs a few steps on device.

Usage: python tools/debug_edl_step.py LEVEL
  LEVEL 0: TGNH on everything, no LD/images/efield/externals
        1: + Langevin on the electrode
        2: + image pairs + mirror + molecule links
        3: + electric field on the electrolyte
        4: + restraint/wall external forces (== run-edl wiring)
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    level = int(sys.argv[1])
    import jax
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.helper import (
        add_clpol_coul_tt, add_molecule_links, assign_image_charges,
        mirror_image_exclusions, set_lj_interaction_groups)
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.ops import external

    d = "/tmp/edl_real/edl_Im21"
    gro = GroFile(d + "/conf.gro")
    lz = float(gro.box[2])
    psf = OplsPsfFile(d + "/topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "/ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    top = built.topology
    group_mos = top.select_by_residue_name("MoS2")
    group_mos_core = [i for i in group_mos
                      if not top.atom_names[i].startswith("D")]
    group_img = top.select_by_residue_name("IMG")
    group_ils = top.select_by_residue_name("MoS2", "IMG", invert=True)
    group_ils_drude = [i for i in group_ils
                       if top.atom_names[i].startswith("D")]
    image_pairs = list(zip(group_ils, group_img))
    donors = [a.idx for a in psf.atom_list if a.attype == "HO"]
    if donors:
        add_clpol_coul_tt(built, donors)
    assign_image_charges(built, image_pairs)
    mirror_image_exclusions(built, image_pairs)
    groups = np.zeros(built.system.n_atoms, np.int32)
    groups[group_img] = 1
    groups[group_mos] = 2
    set_lj_interaction_groups(built, groups, [(0, 0), (0, 2), (2, 2), (1, 0)])

    externals = []
    if level >= 4:
        kcal_a2 = 4.184 / 0.01
        externals.append(external.spring_self(
            group_mos_core, gro.positions,
            [0.01 * kcal_a2, 0.01 * kcal_a2, 5.0 * kcal_a2]))
        externals.append(external.wall_lj126(
            group_ils_drude, 2, (0.0, lz / 2),
            epsilon=0.5 * 4.184, sigma=0.15))

    random.seed(0)
    positions = np.array(gro.positions)
    for i in range(len(positions)):
        positions[i] += (np.array([random.random(), random.random(),
                                   random.random()]) / 1000.0)

    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    integ.setUseMiddleScheme(True)
    integ.setMaxDrudeDistance(0.02)
    if level >= 1:
        for i in group_mos:
            integ.addParticleLangevin(i)
    if level >= 2:
        integ.setMirrorLocation(lz / 2)
        for parent, image in image_pairs:
            integ.addImagePair(image, parent)
        add_molecule_links(built, image_pairs)
    if level >= 3:
        integ.setElectricField(1.0 / lz * 2)
        for i in group_ils:
            integ.addParticleElectrolyte(i)

    built.refinalize()
    ctx = Context(built.system, integ, positions=positions, box=gro.box,
                  external_forces=externals)
    ctx.set_velocities_to_temperature(333.0)
    print(f"level={level} stepping...", flush=True)
    ctx.step(3)
    jax.block_until_ready(ctx._carry.state.pos)
    ke = ctx.kinetic_energy()
    print(f"level={level} OK ke={ke:.2f} finite={np.isfinite(ke)}",
          flush=True)


if __name__ == "__main__":
    main()
