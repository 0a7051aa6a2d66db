#!/usr/bin/env python3
"""Headline benchmark: bulk CLPol Drude ionic liquid (bulk_Im21, 9250 atoms
incl. Drude particles), TGNH thermostat, 1 fs middle scheme, PME-accuracy
Ewald electrostatics — the reference's own benchmark configuration
(run-bulk.py --thermostat nose-hoover on examples/models/bulk_Im21).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the driver target of 100 ns/day (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

    d = "/root/reference/examples/models/bulk_Im21/"
    gro = GroFile(d + "conf.gro")
    psf = OplsPsfFile(d + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)

    dt = 0.001
    integ = VVIntegrator(333, 10, 1, 40, dt)
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
    ctx.set_velocities_to_temperature(333.0)

    import jax
    ctx.step(20)  # compile + warm up
    jax.block_until_ready(ctx._carry.state.pos)
    n = 500
    t0 = time.time()
    ctx.step(n)
    jax.block_until_ready(ctx._carry.state.pos)
    elapsed = time.time() - t0
    steps_per_s = n / elapsed
    ns_day = steps_per_s * dt * 1e-3 * 86400.0
    assert np.isfinite(ctx.kinetic_energy())
    print(json.dumps({
        "metric": "bulk_Im21_drude_tgnh_ns_day",
        "value": round(ns_day, 2),
        "unit": "ns/day",
        "vs_baseline": round(ns_day / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
