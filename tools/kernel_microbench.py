#!/usr/bin/env python3
"""Microbenchmark the Pallas plist pair kernel in isolation on the 19.5k
headline config (bulk_ImO1 x2).  Reports per-call latency, the candidate
pair-list occupancy (active entries vs capacity), and per-program cost —
the inputs for in-kernel optimization A/Bs (VERDICT r4 #3).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(model="bulk_ImO1", factors=(1, 1, 2)):
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
    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(333.0)
    ctx.step(20)
    return ctx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bulk_ImO1")
    ap.add_argument("--replicate", default="1,1,2")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.replicate.split(","))

    import jax
    import jax.numpy as jnp
    from openmm_velocityverlet_tpu.ops import pallas_pair

    ctx = build(args.model, factors)
    fe = ctx.evaluator
    s = fe.system
    pos = ctx._carry.state.pos
    box = ctx._carry.state.box
    cache = jax.jit(fe.make_pair_cache)(pos, box)

    plist_np = np.asarray(cache.plist)
    active = int(((plist_np & 1) == 1).sum())
    cap = plist_np.shape[0]
    n_pad = int(cache.qT.shape[1])
    ts = fe.pair_ts
    print(f"n={s.n_atoms} n_pad={n_pad} ts={ts} tiles={n_pad // ts} "
          f"plist: {active} active / {cap} capacity "
          f"({100.0 * active / cap:.0f}%)")
    has_ex = int((((plist_np & 1) == 1) & ((plist_np & 2) != 0)).sum())
    diag = int((((plist_np & 1) == 1)
                & ((plist_np >> 17) == ((plist_np >> 3) & 0x3FFF))).sum())
    print(f"  excl-flagged: {has_ex}/{active}  diag: {diag}/{active}")

    pad = n_pad - s.n_atoms
    pos_pad = jnp.concatenate(
        [pos.astype(jnp.float32), jnp.full((pad, 3), 1e6, jnp.float32)],
        axis=0)[cache.perm]
    posT = pos_pad.T

    def bench(label, plist_arg, we=False):
        r = functools.partial(
            pallas_pair._run_plist, plist_arg, pos_pad, cache.q2d,
            cache.ab2, cache.bits2d, cache.oidT.reshape(-1, 1), posT,
            cache.qT, cache.oh2T, cache.bitsT, cache.oidT,
            jnp.asarray(box, jnp.float32).reshape(3),
            beta=float(s.ewald_beta), r_cutoff=float(s.r_cutoff), ts=ts,
            n_real=s.n_atoms, r_switch=float(s.r_switch),
            nowrap=fe.plist_nowrap)
        rows, colacc = r(want_energy=we)
        jax.block_until_ready(rows)
        t0 = time.time()
        for _ in range(args.iters):
            rows, colacc = r(want_energy=we)
        jax.block_until_ready(rows)
        dt = (time.time() - t0) / args.iters
        nslots = plist_arg.shape[0]
        print(f"{label}: {dt * 1e3:.3f} ms/call  "
              f"({dt * 1e6 / max(active, 1):.2f} us/active program, "
              f"{nslots} slots)")
        return np.asarray(rows), np.asarray(colacc)

    r0, c0 = bench("baseline  want_energy=False", cache.plist)
    if any(fe.plist_nowrap):
        saved = fe.plist_nowrap
        fe.plist_nowrap = (False, False, False)
        rw, cw = bench("probe: per-pair wrap on all axes", cache.plist)
        fe.plist_nowrap = saved
        print("  nowrap rel err:", float(np.nanmax(np.abs(rw - r0)
              / np.maximum(np.abs(r0), 1e-3))))
    bench("want_energy=True", cache.plist, we=True)
    # perf probe (NOT physics-correct): clear the has_ex flags to measure
    # what the exclusion integer ops cost across the flagged 43% of tiles
    noex = jnp.asarray(plist_np & ~np.int32(2))
    bench("probe: no exclusion ops", noex)
    pallas_pair.MXU_ROW_REDUCE = True
    r2_, c2_ = bench("mxu-row-reduce", cache.plist)
    pallas_pair.MXU_ROW_REDUCE = False
    print("  mxu rel err:", float(np.nanmax(np.abs(r2_ - r0)
          / np.maximum(np.abs(r0), 1e-3))))


if __name__ == "__main__":
    main()
