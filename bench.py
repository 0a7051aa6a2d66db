#!/usr/bin/env python3
"""Headline benchmark: bulk CLPol Drude ionic liquid at the ~20k-atom driver
target size (BASELINE.md: ">=100 ns/day, 20k-atom Drude IL, TGNH"), built by
replicating the reference's bulk_ImO1 model (9,750 atoms incl. Drude) twice
along z -> 19,500 atoms, TGNH thermostat, 1 fs middle scheme, PME-accuracy
Ewald electrostatics.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the driver target of 100 ns/day.  The reference-size
bulk_Im21 (9,250 atoms) number is printed to stderr for continuity with
round-1 benchmarks, and the REAL reconstructed edl_Im21 constant-voltage
workload (40,310 atoms, tools/reconstruct_edl_psf.py) rides along as an
"edl" sub-object inside the same JSON line (BASELINE.md: "run-edl.py ...
ns/day at ~40k atoms").
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run_config(model, factors, dt=0.001, steps=500):
    import jax
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.models.replicate import replicate

    d = f"/root/reference/examples/models/{model}/"
    gro = GroFile(d + "conf.gro")
    psf = OplsPsfFile(d + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    system, pos, box = built.system, gro.positions, gro.box
    if factors != (1, 1, 1):
        system, pos, box = replicate(system, pos, box, factors)

    integ = VVIntegrator(333, 10, 1, 40, dt)
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(333.0)
    ctx.step(20)  # compile + warm up
    jax.block_until_ready(ctx._carry.state.pos)
    t0 = time.time()
    ctx.step(steps)
    jax.block_until_ready(ctx._carry.state.pos)
    elapsed = time.time() - t0
    ns_day = steps / elapsed * dt * 1e-3 * 86400.0
    assert np.isfinite(ctx.kinetic_energy())
    return system.n_atoms, ns_day


def run_edl(steps=240, dt=0.001):
    """Real edl_Im21 at 1 V through run-edl's own wiring (image charges,
    interaction groups, restraints, walls, Langevin electrode + TGNH
    liquid)."""
    import importlib.util
    import subprocess
    import jax

    here = os.path.dirname(os.path.abspath(__file__))
    psf = "/tmp/edl_real/edl_Im21/topol.psf"
    if not os.path.exists(psf):
        subprocess.run([sys.executable,
                        os.path.join(here, "tools", "reconstruct_edl_psf.py"),
                        "edl_Im21"], check=True)
    spec = importlib.util.spec_from_file_location(
        "runedl", os.path.join(here, "examples", "run-edl.py"))
    runedl = importlib.util.module_from_spec(spec)
    argv = sys.argv
    sys.argv = ["run-edl.py"]
    spec.loader.exec_module(runedl)
    sys.argv = argv
    d = "/root/reference/examples/models/edl_Im21/"
    sim = runedl.gen_simulation(d + "conf.gro", psf, d + "ff.prm",
                                dt=dt, voltage=1.0)
    ctx = sim.context
    ctx.step(20)
    jax.block_until_ready(ctx._carry.state.pos)
    t0 = time.time()
    ctx.step(steps)
    jax.block_until_ready(ctx._carry.state.pos)
    elapsed = time.time() - t0
    assert np.isfinite(ctx.kinetic_energy())
    return ctx.system.n_atoms, steps / elapsed * dt * 1e-3 * 86400.0


def main():
    import jax
    platform = jax.devices()[0].platform
    n_small, small = run_config("bulk_Im21", (1, 1, 1))
    print(f"bulk_Im21 ({n_small} atoms): {small:.2f} ns/day",
          file=sys.stderr)
    n, ns_day = run_config("bulk_ImO1", (1, 1, 2))
    out = {
        "metric": f"bulk_ImO1x2_{n}atoms_drude_tgnh_ns_day",
        "value": round(ns_day, 2),
        "unit": "ns/day",
        "vs_baseline": round(ns_day / 100.0, 3),
        "platform": platform,
    }
    try:
        n_edl, edl = run_edl()
        print(f"edl_Im21 real ({n_edl} atoms, 1 V): {edl:.2f} ns/day",
              file=sys.stderr)
        out["edl"] = {"metric": f"edl_Im21_real_{n_edl}atoms_1V_ns_day",
                      "value": round(edl, 2), "unit": "ns/day"}
    except Exception as e:  # the headline line must survive an EDL failure
        print(f"EDL bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
