#!/usr/bin/env python3
"""Device-side per-op profile of the full MD step (jax.profiler trace).

Wall-clock timings through the axon tunnel carry a ~30 ms dispatch cost per
call, so per-component loops systematically over-measure by (30ms / iters).
This tool traces the REAL device execution and aggregates per-fusion time,
with HLO source attribution.

Usage: python tools/profile_trace.py [--model bulk_Im21] [--replicate 1,1,2]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bulk_Im21")
    ap.add_argument("--replicate", default="1,1,1")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--ts", type=int, default=0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dump-hlo", default="")
    ap.add_argument("--no-fold14", action="store_true")
    ap.add_argument("--edl", default="", metavar="MODEL_DIR",
                    help="profile the constant-voltage EDL step instead: "
                         "build via run-edl's gen_simulation from MODEL_DIR "
                         "(conf.gro/topol.psf/ff.prm)")
    args = ap.parse_args()

    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.models.replicate import replicate

    if args.edl:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "runedl", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "examples", "run-edl.py"))
        runedl = importlib.util.module_from_spec(spec)
        argv0, sys.argv = sys.argv, ["run-edl.py"]
        spec.loader.exec_module(runedl)
        sys.argv = argv0
        sim = runedl.gen_simulation(args.edl + "/conf.gro",
                                    args.edl + "/topol.psf",
                                    args.edl + "/ff.prm", voltage=1.0)
        ctx = sim.context
        print(f"edl={args.edl} atoms={ctx.system.n_atoms}")
    else:
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
        print(f"model={args.model} x{factors} atoms={system.n_atoms} "
              f"kmax={system.kmax}")

        integ = VVIntegrator(333, 10, 1, 40, 0.001)
        integ.setMaxDrudeDistance(0.02)
        kw = {"pair_ts": args.ts} if args.ts else {}
        if args.no_fold14:
            kw["fold_exc14"] = False
        ctx = Context(system, integ, positions=pos, box=box, **kw)
    ctx.set_velocities_to_temperature(333.0)
    ctx.step(5)
    jax.block_until_ready(ctx._carry.state.pos)

    trace_dir = "/tmp/jaxtrace_step"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        ctx.step(args.steps)
        jax.block_until_ready(ctx._carry.state.pos)

    # ---- HLO source attribution ----
    hlo = ctx._compiled["step_n"].lower(
        ctx._carry, ctx._chunk_scalars[args.steps]).compile().as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    src = {}
    pat = re.compile(r"%?([\w.-]+) = .*metadata=\{([^}]*)\}")
    fpat = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')
    opat = re.compile(r'op_name="([^"]*)"')
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        name, meta = m.groups()
        fm = fpat.search(meta)
        om = opat.search(meta)
        loc = ""
        if fm:
            loc = f"{os.path.basename(fm.group(1))}:{fm.group(2)}"
        op = om.group(1).split("/")[-1] if om else ""
        if name not in src:
            src[name] = f"{loc} {op}"

    # ---- deep attribution: map each fusion to the source lines of the
    # interesting ops (gather/scatter/dot/reduce) INSIDE its fused
    # computation (the fusion root's own metadata usually points at the
    # fori_loop body, which is useless) ----
    fus_calls = {}
    for m in re.finditer(r"%?([\w.-]+) = [^=]*fusion\([^)]*\).*?calls=%?"
                         r"([\w.-]+)", hlo):
        fus_calls[m.group(1)] = m.group(2)
    comp_info = {}
    cur = None
    for line in hlo.splitlines():
        cm = re.match(r"%?([\w.-]+) \(", line)
        if cm and ("fused_computation" in cm.group(1)
                   or line.startswith(("%", "ENTRY"))):
            cur = cm.group(1)
            comp_info[cur] = []
        if cur is None:
            continue
        im = re.search(r"= ([\w\[\]{},0-9]+) (gather|scatter|dot|"
                       r"dynamic-slice|iota|reduce)\(", line)
        if im:
            fm = fpat.search(line)
            loc = (f"{os.path.basename(fm.group(1))}:{fm.group(2)}"
                   if fm else "?")
            comp_info[cur].append(f"{im.group(2)}{im.group(1)} @{loc}")
    deep = {}
    for fname, cname in fus_calls.items():
        hits = comp_info.get(cname, [])
        if hits:
            deep[fname] = " | ".join(hits[:3])

    tr = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                          recursive=True))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e["name"]
            if name.startswith("$") or "(" in name[:4]:
                continue
            if re.match(r"while\.\d+$", name):
                total = max(total, e["dur"])
            agg[name] += e["dur"]
            cnt[name] += 1
    print(f"\nstep program total: {total/1e3/args.steps:.3f} ms/step "
          f"({args.steps} steps)\n")
    print(f"{'us/step':>9s} {'pct':>5s} {'n':>3s}  op  [source]")
    shown = 0.0
    for name, dur in agg.most_common(args.top * 3):
        per = dur / args.steps
        pct = 100.0 * dur / max(total, 1)
        if per >= total / args.steps * 0.9:
            continue
        if name.startswith(("copy-start", "copy-done")) or per < 2.0:
            continue
        shown += per
        detail = deep.get(name) or src.get(name, "?")
        print(f"{per:9.2f} {pct:5.1f} {cnt[name]//args.steps:3d}  "
              f"{name[:28]:28s} {detail[:110]}")
    print(f"\n(shown {shown:.1f} us/step of {total/args.steps:.1f})")


if __name__ == "__main__":
    main()
