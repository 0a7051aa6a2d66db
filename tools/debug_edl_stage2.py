#!/usr/bin/env python3
"""Stage-2 bisect of the EDL-scale fused-step TPU fault: the level-0
wiring (TGNH only) already faults, so test the step-only components and
the loop machinery one at a time on the REAL edl_Im21 system.

Usage: python tools/debug_edl_stage2.py [stage...]
Stages: velcons poscons nhscale hardwall single loop
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    stages = sys.argv[1:] or ["velcons", "poscons", "nhscale", "hardwall",
                              "single", "loop"]
    import jax
    import jax.numpy as jnp
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.helper import (
        add_clpol_coul_tt, assign_image_charges, mirror_image_exclusions,
        set_lj_interaction_groups)
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.integrators import stepping
    from openmm_velocityverlet_tpu.ops import constraints as cons_mod

    d = "/tmp/edl_real/edl_Im21"
    gro = GroFile(d + "/conf.gro")
    psf = OplsPsfFile(d + "/topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "/ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    top = built.topology
    group_mos = top.select_by_residue_name("MoS2")
    group_img = top.select_by_residue_name("IMG")
    group_ils = top.select_by_residue_name("MoS2", "IMG", invert=True)
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

    random.seed(0)
    positions = np.array(gro.positions)
    for i in range(len(positions)):
        positions[i] += (np.array([random.random(), random.random(),
                                   random.random()]) / 1000.0)

    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    integ.setUseMiddleScheme(True)
    integ.setMaxDrudeDistance(0.02)
    built.refinalize()
    ctx = Context(built.system, integ, positions=positions, box=gro.box)
    ctx.set_velocities_to_temperature(333.0)
    if ctx._carry is None:
        ctx._carry = ctx._make_carry()
    carry = ctx._carry
    st = carry.state
    pos, vel, box = st.pos, st.vel, st.box
    sysm = ctx.system
    data = ctx.data
    cons = ctx.cons
    masses = np.asarray(sysm.masses)
    inv_m = np.asarray(sysm.inv_masses)
    mol_runs = stepping.mol_runs_from_id(sysm.particle_mol_id)
    print(f"n={sysm.n_atoms} n_cons={cons.n_constraints}", flush=True)

    def run(name, fn):
        print(f"--- {name} ...", flush=True)
        try:
            out = fn()
            jax.block_until_ready(out)
            print("    OK", flush=True)
            return True
        except Exception as e:
            print(f"    FAULT {type(e).__name__}: {e}", flush=True)
            return False

    for stg in stages:
        if stg == "velcons":
            ok = run("apply_velocity_constraints", lambda: jax.jit(
                lambda p, v, b: cons_mod.apply_velocity_constraints(
                    p, v, b, cons, inv_m))(pos, vel, box))
        elif stg == "poscons":
            ok = run("apply_position_constraints", lambda: jax.jit(
                lambda p, np_, b: cons_mod.apply_position_constraints(
                    p, np_, b, cons, inv_m))(pos, pos + 1e-4, box))
        elif stg == "nhscale":
            def nh(p, v, b):
                return stepping.nh_scale_velocities(
                    v, masses, inv_m, sysm.particle_mol_id, sysm.mol_masses,
                    sysm.mol_inv_masses, data, st.nh_eta, st.nh_eta_dot,
                    st.nh_eta_dotdot, mol_table=sysm.mol_table,
                    mol_runs=mol_runs)[0]
            ok = run("nh_scale_velocities", lambda: jax.jit(nh)(pos, vel, box))
        elif stg == "hardwall":
            ok = run("apply_hardwall", lambda: jax.jit(
                lambda p, v, b: stepping.apply_hardwall(
                    p, v, masses, inv_m, b, data))(pos, vel, box))
        elif stg == "single":
            single = ctx._build_step_fn()
            cache = jax.jit(ctx.evaluator.make_pair_cache)(pos, box)
            jax.block_until_ready(cache)
            ok = run("single step (jit, cache passed)", lambda: jax.jit(
                lambda c: single(c, cache))(carry))
        elif stg == "fused_cache":
            single = ctx._build_step_fn()
            ev = ctx.evaluator

            def f(c):
                cache = ev.make_pair_cache(c.state.pos, c.state.box)
                return single(c, cache)
            ok = run("make_pair_cache + step in ONE program",
                     lambda: jax.jit(f)(carry))
        elif stg == "cond_cache":
            single = ctx._build_step_fn()
            ev = ctx.evaluator
            cache0 = jax.jit(ctx.evaluator.make_pair_cache)(pos, box)
            jax.block_until_ready(cache0)

            def f(c, cache, need):
                cache = jax.lax.cond(
                    need, lambda a: ev.make_pair_cache(a[0], a[1]),
                    lambda a: cache, (c.state.pos, c.state.box))
                return single(c, cache)
            ok = run("cond(make_pair_cache) + step",
                     lambda: jax.jit(f)(carry, cache0,
                                        jnp.ones((), bool)))
        elif stg == "inner_while":
            single = ctx._build_step_fn()
            cache0 = jax.jit(ctx.evaluator.make_pair_cache)(pos, box)
            jax.block_until_ready(cache0)

            def f(c, cache):
                def body(t):
                    return single(t[0], cache), t[1] + 1
                c, _ = jax.lax.while_loop(
                    lambda t: (t[1] < 3) & ~t[0].cov_bad, body,
                    (c, jnp.zeros((), jnp.int32)))
                return c
            ok = run("while_loop(step, cache const)",
                     lambda: jax.jit(f)(carry, cache0))
        elif stg == "outer_carry":
            single = ctx._build_step_fn()
            ev = ctx.evaluator
            cache0 = jax.jit(ctx.evaluator.make_pair_cache)(pos, box)
            jax.block_until_ready(cache0)

            def f(c, cache):
                def body(s):
                    c, cache, i = s
                    cache = jax.lax.cond(
                        i == 0, lambda a: ev.make_pair_cache(a[0], a[1]),
                        lambda a: cache, (c.state.pos, c.state.box))
                    return (single(c, cache), cache, i + 1)
                return jax.lax.while_loop(
                    lambda s: s[2] < 3, body,
                    (c, cache, jnp.zeros((), jnp.int32)))[0]
            ok = run("while(cond(make)+step), cache CARRIED",
                     lambda: jax.jit(f)(carry, cache0))
        elif stg == "nested":
            single = ctx._build_step_fn()
            ev = ctx.evaluator
            cache0 = jax.jit(ctx.evaluator.make_pair_cache)(pos, box)
            jax.block_until_ready(cache0)

            def f(c, cache):
                def outer_body(s):
                    c, cache, done, first = s
                    cache = jax.lax.cond(
                        ~first | c.cov_bad,
                        lambda a: ev.make_pair_cache(a[0], a[1]),
                        lambda a: cache, (c.state.pos, c.state.box))
                    c = c.replace(cov_bad=jnp.zeros((), bool))

                    def inner_body(t):
                        return single(t[0], cache), t[1] + 1
                    c, done = jax.lax.while_loop(
                        lambda t: (t[1] < 3) & ~t[0].cov_bad, inner_body,
                        (c, done))
                    return (c, cache, done, jnp.zeros((), bool))
                return jax.lax.while_loop(
                    lambda s: s[2] < 3, outer_body,
                    (c, cache, jnp.zeros((), jnp.int32),
                     jnp.ones((), bool)))[0]
            ok = run("NESTED while(cond(make)+while(step)) [step_n shape]",
                     lambda: jax.jit(f)(carry, cache0))
        elif stg == "loop":
            ok = run("ctx.step(3) [step_n loop]",
                     lambda: (ctx.step(3), ctx._carry.state.pos)[1])
        if not ok:
            pass
    print("done", flush=True)


if __name__ == "__main__":
    main()
