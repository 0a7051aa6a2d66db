#!/usr/bin/env python3
"""Drude-friction sensitivity table on bulk_Im21 (TPU).

run-bulk.py keeps the reference's 20/ps Drude Langevin friction as its
default (drudeLangevin.cu:2-60 semantics).  At dt = 1 fs the stiff-spring
discretization elevates the KINETIC T_drude reading there; this tool
produces the evidence that the sampled ensemble does not care: it runs the
real 9,250-atom model at drude friction 20 and 100 /ps and reports, per
run, T_atom / kinetic T_drude / mean-square Drude displacement (the
configurational observable controlling induced dipoles) / mean potential
energy.  <dr^2> and <U> agreeing across frictions while T_drude differs is
the expected signature.

Usage: python tools/langevin_friction_check.py [steps_per_phase]
Writes /tmp/langevin_friction.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
    import jax

    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.units import BOLTZ

    d = "/root/reference/examples/models/bulk_Im21/"
    gro = GroFile(d + "conf.gro")
    psf = OplsPsfFile(d + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    system = built.system
    dp = np.asarray(system.drude_pairs)
    m = np.asarray(system.masses)
    mu = (m[dp[:, 0]] * m[dp[:, 1]] / (m[dp[:, 0]] + m[dp[:, 1]]))

    results = {}
    for friction in (20.0, 100.0):
        integ = VVIntegrator(333.0, 5.0, 1.0, 20.0, 0.001)
        integ.setDrudeFriction(friction)
        integ.setMaxDrudeDistance(0.02)
        for i in range(system.n_atoms):
            integ.addParticleLangevin(i)
        ctx = Context(system, integ, positions=gro.positions, box=gro.box)
        ctx.set_velocities_to_temperature(333.0)
        ctx.step(steps)                       # equilibrate
        jax.block_until_ready(ctx._carry.state.pos)
        dr2, td, epot = [], [], []
        for _ in range(10):
            ctx.step(steps // 10)
            pos = ctx.get_positions()
            vel = ctx.get_velocities()
            drv = pos[dp[:, 0]] - pos[dp[:, 1]]
            dr2.append(float(np.mean(np.sum(drv * drv, -1))))
            rel = vel[dp[:, 0]] - vel[dp[:, 1]]
            td.append(float(np.sum(mu[:, None] * rel * rel)
                            / (3.0 * dp.shape[0] * BOLTZ)))
            epot.append(ctx.potential_energy())
        results[f"{friction:.0f}"] = {
            "T_drude_kinetic_K": round(float(np.mean(td)), 3),
            "dr2_nm2_mean": float(np.mean(dr2)),
            "dr2_nm2_sem": float(np.std(dr2) / np.sqrt(len(dr2))),
            "U_mean_kJmol": round(float(np.mean(epot)), 1),
            "U_sem": round(float(np.std(epot) / np.sqrt(len(epot))), 1),
        }
    a, b = results["20"], results["100"]
    results["dr2_ratio_20_over_100"] = round(
        a["dr2_nm2_mean"] / b["dr2_nm2_mean"], 4)
    with open("/tmp/langevin_friction.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
