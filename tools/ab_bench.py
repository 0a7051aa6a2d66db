#!/usr/bin/env python3
"""A/B timing harness for step-level perf knobs on real hardware.

Times the headline 19.5k-atom TGNH config (or any model/replication) under a
chosen combination of knobs, printing ms/step + ns/day as one JSON line so
runs are directly comparable across processes (each knob set gets a fresh
process: JAX caches compilations per-process, and module flags like
LJ_DOT_BF16 are import-time).

Usage:
  python tools/ab_bench.py --recip exact_fused
  python tools/ab_bench.py --recip exact --bf16 0
  python tools/ab_bench.py --model bulk_Im21 --replicate 1,1,1 --steps 1000
  python tools/ab_bench.py --edl /tmp/edl_real/edl_Im21 --sort-refresh 240
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bulk_ImO1")
    ap.add_argument("--replicate", default="1,1,2")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--recip", default="auto")
    ap.add_argument("--bf16", type=int, default=-1,
                    help="override ops.pallas_pair.LJ_DOT_BF16 (0/1)")
    ap.add_argument("--sort-refresh", type=int, default=120)
    ap.add_argument("--pair-ts", type=int, default=0)
    ap.add_argument("--strict", type=int, default=0,
                    help="strict_pairs (in-step exact fallback cond)")
    ap.add_argument("--ewald-chunk", type=int, default=0,
                    help="override Context ewald_chunk (0 = default)")
    ap.add_argument("--edl", default="", metavar="MODEL_DIR",
                    help="time the constant-voltage EDL step from MODEL_DIR "
                         "instead of a bulk model")
    args = ap.parse_args()

    import jax
    from openmm_velocityverlet_tpu.ops import pallas_pair
    if args.bf16 >= 0:
        pallas_pair.LJ_DOT_BF16 = bool(args.bf16)

    if args.edl:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "runedl", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "examples", "run-edl.py"))
        runedl = importlib.util.module_from_spec(spec)
        argv0, sys.argv = sys.argv, ["run-edl.py"]
        spec.loader.exec_module(runedl)
        sys.argv = argv0
        kw = {}
        if args.ewald_chunk:
            kw["ewald_chunk"] = args.ewald_chunk
        if args.strict:
            kw["strict_pairs"] = True
        sim = runedl.gen_simulation(
            args.edl + "/conf.gro", args.edl + "/topol.psf",
            args.edl + "/ff.prm", voltage=1.0, recip=args.recip,
            sort_refresh=args.sort_refresh, pair_ts=args.pair_ts, **kw)
        ctx = sim.context
        label = f"edl:{os.path.basename(args.edl)}"
    else:
        from openmm_velocityverlet_tpu import Context, VVIntegrator
        from openmm_velocityverlet_tpu.models.grofile import GroFile
        from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
        from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
        from openmm_velocityverlet_tpu.models.replicate import replicate

        d = f"/root/reference/examples/models/{args.model}/"
        gro = GroFile(d + "conf.gro")
        psf = OplsPsfFile(d + "topol.psf",
                          periodicBoxVectors=gro.getPeriodicBoxVectors())
        prm = CharmmParameterSet(d + "ff.prm")
        built = psf.createSystem(prm, nonbondedCutoff=1.2,
                                 constraints="HBonds", rigidWater=True)
        system, pos, box = built.system, gro.positions, gro.box
        factors = tuple(int(x) for x in args.replicate.split(","))
        if factors != (1, 1, 1):
            system, pos, box = replicate(system, pos, box, factors)
        integ = VVIntegrator(333, 10, 1, 40, 0.001)
        integ.setMaxDrudeDistance(0.02)
        kw = {}
        if args.ewald_chunk:
            kw["ewald_chunk"] = args.ewald_chunk
        ctx = Context(system, integ, positions=pos, box=box,
                      recip=args.recip, sort_refresh=args.sort_refresh,
                      pair_ts=args.pair_ts,
                      strict_pairs=bool(args.strict), **kw)
        ctx.set_velocities_to_temperature(333.0)
        label = f"{args.model}x{args.replicate}"

    recip_used = getattr(ctx.evaluator, "recip_method", "?")
    ctx.step(20)
    jax.block_until_ready(ctx._carry.state.pos)
    t0 = time.time()
    ctx.step(args.steps)
    jax.block_until_ready(ctx._carry.state.pos)
    el = time.time() - t0
    assert np.isfinite(ctx.kinetic_energy())
    ms = el / args.steps * 1e3
    print(json.dumps({
        "label": label, "n_atoms": int(ctx.system.n_atoms),
        "recip": args.recip, "recip_used": recip_used,
        "bf16": pallas_pair.LJ_DOT_BF16,
        "sort_refresh": args.sort_refresh, "pair_ts": args.pair_ts,
        "strict": bool(args.strict),
        "ms_step": round(ms, 4),
        "ns_day": round(args.steps / el * 0.001 * 1e-3 * 86400.0, 2),
    }))


if __name__ == "__main__":
    main()
