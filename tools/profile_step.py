#!/usr/bin/env python3
"""Per-component TPU timings for the MD step (in-loop, tunnel-safe).

Usage: python tools/profile_step.py [--model bulk_Im21] [--replicate 1,1,2]
Each component is timed inside one jitted lax.fori_loop (single-call timings
through the axon tunnel are noise), threading a dependency so nothing DCEs.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters):
    out = fn(*args)          # compile + warm
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:32s} {dt:8.3f} ms/iter")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bulk_Im21")
    ap.add_argument("--replicate", default="1,1,1")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--layout", action="store_true",
                    help="run the (N,3) vs (3,N) layout microbench")
    args = ap.parse_args()
    iters = args.iters

    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.models.replicate import replicate
    from openmm_velocityverlet_tpu.integrators import stepping
    from openmm_velocityverlet_tpu.ops import constraints as cons_mod

    if args.layout:
        n = 19456
        a3 = jnp.ones((n, 3), jnp.float32)
        a3t = jnp.ones((3, n), jnp.float32)

        def loop(x):
            def body(i, x):
                return x + 0.5 * x * x - 0.1 * x
            return jax.lax.fori_loop(0, 1000, body, x)

        f = jax.jit(loop)
        timeit("(N,3) fma x1000", f, a3, iters=1000)
        timeit("(3,N) fma x1000", f, a3t, iters=1000)

    d = f"/root/reference/examples/models/{args.model}/"
    gro = GroFile(d + "conf.gro")
    psf = OplsPsfFile(d + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    system, pos, box = built.system, gro.positions, gro.box
    factors = tuple(int(x) for x in args.replicate.split(","))
    if factors != (1, 1, 1):
        system, pos, box = replicate(system, pos, box, factors)
    print(f"model={args.model} x{factors} atoms={system.n_atoms} "
          f"kmax={system.kmax} beta={system.ewald_beta:.3f}")

    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(333.0)
    ev = ctx.evaluator
    print(f"pair_kernel={ev.pair_kernel} band_w={ev.band_w} "
          f"uses_band={ev.uses_band} ts={ev.pair_ts}")

    pos_j = jnp.asarray(pos, jnp.float32)
    box_j = jnp.asarray(box, jnp.float32)
    vel_j = jnp.asarray(ctx.get_velocities())
    inv_m = np.asarray(system.inv_masses)
    masses = np.asarray(system.masses)

    cache = (jax.jit(ev.make_pair_cache)(pos_j, box_j)
             if ev.uses_band else None)

    # ---- pair sweep (forces only, as the step uses it) ----
    def pair_loop(p):
        def body(i, p):
            _, _, _, f = __import__(
                "openmm_velocityverlet_tpu.ops.pallas_pair",
                fromlist=["x"]).direct_space_pallas(
                ev.place_vsites(p), box_j, jnp.asarray(system.charges),
                ev.pair_tables, system.ewald_beta, system.r_cutoff,
                ts=ev.pair_ts, band_w=ev.band_w, want_energy=False,
                cache=cache)
            return p + 1e-12 * f
        return jax.lax.fori_loop(0, iters, body, p)
    timeit("pair sweep (pallas, F-only)", jax.jit(pair_loop), pos_j,
           iters=iters)

    # ---- cache rebuild ----
    if cache is not None:
        def cache_loop(p):
            def body(i, p):
                c = ev.make_pair_cache(p, box_j)
                return p + 1e-12 * c.q2d[0, 0]
            return jax.lax.fori_loop(0, iters, body, p)
        timeit("z-sort cache rebuild", jax.jit(cache_loop), pos_j,
               iters=iters)

    # ---- bonded/Drude/Thole term pass ----
    from openmm_velocityverlet_tpu.ops import term_forces
    tt, ti, tsl = ev.term_tables

    def term_loop(p):
        def body(i, p):
            _, f = term_forces.energies_and_forces(p, box_j, tt, ti, tsl)
            return p + 1e-12 * f
        return jax.lax.fori_loop(0, iters, body, p)
    timeit("bonded/drude/thole terms", jax.jit(term_loop), pos_j, iters=iters)

    # ---- reciprocal Ewald (energy + grad, as the step uses it) ----
    from openmm_velocityverlet_tpu.ops import ewald

    def recip_loop(p):
        def body(i, p):
            e, g = jax.value_and_grad(
                lambda q: ewald.reciprocal_energy(
                    q, box_j, system.charges, system.ewald_beta, system.kmax,
                    chunk=ev.ewald_chunk))(p)
            return p + 1e-12 * g
        return jax.lax.fori_loop(0, iters, body, p)
    timeit("ewald reciprocal (E+grad)", jax.jit(recip_loop), pos_j,
           iters=iters)

    # ---- constraints ----
    cons = ctx.cons
    if cons.n_constraints:
        def cons_loop(p):
            def body(i, p):
                cp = cons_mod.apply_position_constraints(
                    pos_j, p, box_j, cons, inv_m)
                return p + 1e-6 * (cp - p)
            return jax.lax.fori_loop(0, iters, body, p)
        timeit("position constraints", jax.jit(cons_loop),
               pos_j + 1e-4, iters=iters)

        def vcons_loop(v):
            def body(i, v):
                return cons_mod.apply_velocity_constraints(
                    pos_j, v, box_j, cons, inv_m) * (1.0 + 1e-12)
            return jax.lax.fori_loop(0, iters, body, v)
        timeit("velocity constraints", jax.jit(vcons_loop), vel_j,
               iters=iters)

    # ---- thermostat ----
    data = ctx.data
    st = ctx.state

    def nh_loop(v):
        def body(i, carry):
            v, eta, eta_dot, eta_dotdot = carry
            v, eta, eta_dot, eta_dotdot, _ = stepping.nh_scale_velocities(
                v, masses, inv_m, system.particle_mol_id, system.mol_masses,
                system.mol_inv_masses, data, eta, eta_dot, eta_dotdot,
                mol_table=system.mol_table)
            return v, eta, eta_dot, eta_dotdot
        out = jax.lax.fori_loop(
            0, iters, body, (v, st.nh_eta, st.nh_eta_dot, st.nh_eta_dotdot))
        return out[0]
    timeit("TGNH thermostat", jax.jit(nh_loop), vel_j, iters=iters)

    # ---- hardwall + drift pieces ----
    def hw_loop(p):
        def body(i, p):
            hp, _ = stepping.apply_hardwall(p, vel_j, masses, inv_m, box_j,
                                            data)
            return p + 1e-12 * hp
        return jax.lax.fori_loop(0, iters, body, p)
    timeit("drude hardwall", jax.jit(hw_loop), pos_j, iters=iters)

    # ---- full step ----
    ctx.step(5)
    jax.block_until_ready(ctx._carry.state.pos)
    t0 = time.time()
    ctx.step(iters)
    jax.block_until_ready(ctx._carry.state.pos)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{'FULL STEP':32s} {dt:8.3f} ms/iter "
          f"({0.001 * 86400.0 / dt:.1f} ns/day at 1 fs)")


if __name__ == "__main__":
    main()
