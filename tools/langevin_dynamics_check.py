#!/usr/bin/env python3
"""Dynamical parity of the two partitioned-Langevin formulations
(VERDICT r3 item 9).

The middle scheme integrates Langevin with the exact Ornstein-Uhlenbeck
velocity map; the VV scheme uses the reference's extra-force form
(drudeLangevin.cu: F += -gamma m v + sigma sqrt(m) xi).  At the reference
settings (20/ps atoms, gamma dt = 0.02) the two must produce the same
dynamics, not just the same configurational ensemble.  This measures the
molecular-COM diffusion coefficient (MSD slope, the standard dynamical
observable of an ionic liquid) for both schemes on bulk_Im21 and reports
the kinetic temperature partitions alongside.

Usage: python tools/langevin_dynamics_check.py [nsteps_prod=30000]
Writes /tmp/langevin_dynamics.json.  TPU, ~6-10 min total.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = "/root/reference/examples/models/bulk_Im21/"


def build(use_middle):
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    gro = GroFile(D + "conf.gro")
    psf = OplsPsfFile(D + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(D + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    integ = VVIntegrator(333.0, 10.0, 1.0, 40.0, 0.001)
    integ.setUseMiddleScheme(use_middle)
    integ.setMaxDrudeDistance(0.02)
    integ.setFriction(20.0)           # reference run-bulk Langevin default
    integ.setDrudeFriction(20.0)
    for i in range(built.system.n_atoms):
        integ.addParticleLangevin(i)
    ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
    ctx.set_velocities_to_temperature(333.0)
    return ctx, built


def com_positions(ctx, system):
    pos = np.asarray(ctx.state.pos, np.float64)  # unwrapped (engine never
    m = np.asarray(system.masses, np.float64)    # re-images positions)
    mol = np.asarray(system.particle_mol_id)
    nmol = int(mol.max()) + 1
    num = np.zeros((nmol, 3))
    for d in range(3):
        np.add.at(num[:, d], mol, m * pos[:, d])
    tot = np.zeros(nmol)
    np.add.at(tot, mol, m)
    return num / tot[:, None]


def t_drude(ctx, system):
    from openmm_velocityverlet_tpu.units import BOLTZ
    dp = np.asarray(system.drude_pairs)
    vel = np.asarray(ctx.state.vel)
    m = np.asarray(system.masses)
    mu = m[dp[:, 0]] * m[dp[:, 1]] / (m[dp[:, 0]] + m[dp[:, 1]])
    rel = vel[dp[:, 0]] - vel[dp[:, 1]]
    return float(np.sum(mu[:, None] * rel * rel) / (3 * dp.shape[0] * BOLTZ))


def run(use_middle, nprod, sample_every=500, nequil=5000):
    import jax
    ctx, built = build(use_middle)
    ctx.step(nequil)
    jax.block_until_ready(ctx._carry.state.pos)
    frames, tds = [], []
    t0 = time.time()
    nchunks = nprod // sample_every
    for c in range(nchunks):
        ctx.step(sample_every)
        frames.append(com_positions(ctx, built.system))
        if c % 10 == 0:
            tds.append(t_drude(ctx, built.system))
    el = time.time() - t0
    frames = np.asarray(frames)                  # (F, M, 3)
    # MSD over the second half lag window, averaged over time origins
    dt_frame = sample_every * 0.001              # ps
    lags = np.arange(1, len(frames) // 2)
    msd_mol = np.array([np.mean(np.sum(
        (frames[lag:] - frames[:-lag]) ** 2, axis=-1), axis=0)
        for lag in lags])                        # (L, M)
    msd = msd_mol.mean(axis=1)
    # D from the linear fit of the diffusive tail (drop the first quarter)
    q = len(lags) // 4
    t = lags[q:] * dt_frame

    def slope_of(y):
        return np.polyfit(t, y, 1)[0] / 6.0 * 1e-2   # cm^2/s

    diff = slope_of(msd[q:])
    # error bar: block the molecules into 8 groups (independent walkers up
    # to hydrodynamic coupling) and take the spread of block D estimates
    nmol = msd_mol.shape[1]
    blocks = np.array_split(np.arange(nmol), 8)
    d_blocks = np.array([slope_of(msd_mol[q:, b].mean(axis=1))
                         for b in blocks])
    d_err = float(d_blocks.std(ddof=1) / np.sqrt(len(blocks)))
    return {
        "scheme": "middle/OU" if use_middle else "vv/extra-force",
        "D_cm2_s": diff,
        "D_err_cm2_s": d_err,
        "msd_nm2_at_half": float(msd[-1]),
        "t_drude_mean_K": float(np.mean(tds)),
        "steps_per_s": round(nprod / el, 1),
    }


def main():
    nprod = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    out = {"model": "bulk_Im21", "friction_per_ps": 20.0, "dt_ps": 0.001,
           "nprod": nprod}
    for mid in (True, False):
        r = run(mid, nprod)
        out[r["scheme"]] = r
        print(json.dumps(r), flush=True)
    a = out["middle/OU"]["D_cm2_s"]
    b = out["vv/extra-force"]["D_cm2_s"]
    out["D_ratio_middle_over_vv"] = a / b if b else None
    if b:
        ea = out["middle/OU"]["D_err_cm2_s"]
        eb = out["vv/extra-force"]["D_err_cm2_s"]
        out["D_ratio_err"] = abs(a / b) * math.sqrt(
            (ea / a) ** 2 + (eb / b) ** 2) if a and b else None
    with open("/tmp/langevin_dynamics.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
