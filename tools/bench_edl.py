#!/usr/bin/env python3
"""EDL-scale benchmark: the synthesized ~37k-atom constant-voltage system
(tools/make_edl_model.py) through run-edl.py's builder on real TPU.

Reports ns/day, verifies the image-charge sync is exact after stepping
(z_img = 2*mirror - z_parent, imageCharge.cu:21-25), and writes a
charge-density profile rho_q(z) to /tmp/edl_charge_profile.txt.

Usage: python tools/bench_edl.py [model_dir] [steps]
"""
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edl_model"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    if not os.path.isdir(model):
        os.system(f"{sys.executable} "
                  f"{os.path.dirname(os.path.abspath(__file__))}"
                  f"/make_edl_model.py {model}")
    spec = importlib.util.spec_from_file_location(
        "runedl", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "run-edl.py"))
    runedl = importlib.util.module_from_spec(spec)
    argv0 = sys.argv
    sys.argv = ["run-edl.py"]
    spec.loader.exec_module(runedl)
    sys.argv = argv0

    os.chdir("/tmp")
    import jax

    # phase 1: relax the freshly stacked configuration with small-dt
    # dynamics (the reference's edl configs are pre-equilibrated; direct
    # minimization chases image-charge minima into hot spots)
    relax = runedl.gen_simulation(model + "/conf.gro", model + "/topol.psf",
                                  model + "/ff.prm", dt=0.0002, voltage=1.0)
    relax.context.set_velocities_to_temperature(100.0)
    relax.context.step(4000)
    jax.block_until_ready(relax.context._carry.state.pos)
    print(f"relaxed: KE={relax.context.kinetic_energy():.4g}",
          file=sys.stderr)
    relaxed_pos = relax.context.get_positions()

    # phase 2: production-dt benchmark
    sim = runedl.gen_simulation(model + "/conf.gro", model + "/topol.psf",
                                model + "/ff.prm", voltage=1.0)
    ctx = sim.context
    dt = ctx.data.dt
    ctx.set_positions(relaxed_pos)
    ctx.set_velocities_to_temperature(333.0)
    ctx.step(20)
    jax.block_until_ready(ctx._carry.state.pos)
    t0 = time.time()
    ctx.step(steps)
    jax.block_until_ready(ctx._carry.state.pos)
    elapsed = time.time() - t0
    ns_day = steps / elapsed * dt * 1e-3 * 86400.0

    # image-sync exactness (BASELINE.md config 5 oracle)
    pos = np.asarray(ctx.state.pos)
    pairs = np.asarray(ctx.data.image_pairs)       # (I,2) (image, parent)
    mirror = ctx.data.mirror_location
    dz = np.abs(pos[pairs[:, 0], 2] - (2 * mirror - pos[pairs[:, 1], 2]))
    dxy = np.abs(pos[pairs[:, 0], :2] - pos[pairs[:, 1], :2]).max()
    assert np.isfinite(ctx.kinetic_energy())

    # charge-density profile over the liquid region
    q = np.asarray(ctx.system.charges)
    box = ctx.get_box()
    nbin = 120
    liquid = q != 0
    hist, edges = np.histogram(pos[:, 2] % float(box[2]), bins=nbin,
                               range=(0, float(box[2])),
                               weights=q)
    vol_bin = float(box[0] * box[1] * box[2]) / nbin
    with open("/tmp/edl_charge_profile.txt", "w") as f:
        f.write("# z(nm)  rho_q (e/nm^3)\n")
        for k in range(nbin):
            f.write(f"{0.5 * (edges[k] + edges[k + 1]):8.3f} "
                    f"{hist[k] / vol_bin:12.5f}\n")

    print(json.dumps({
        "metric": f"edl_{ctx.system.n_atoms}atoms_constant_voltage_ns_day",
        "value": round(ns_day, 2),
        "unit": "ns/day",
        "vs_baseline": round(ns_day / 100.0, 3),
        "image_sync_max_dz": float(dz.max()),
        "image_sync_max_dxy": float(dxy),
    }))


if __name__ == "__main__":
    main()
