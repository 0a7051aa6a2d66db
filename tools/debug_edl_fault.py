#!/usr/bin/env python3
"""Bisect the EDL-scale TPU device fault: evaluate each force-path variant
once on device and report which one faults.

Usage: python tools/debug_edl_fault.py [stage...]
Stages: build pair_plist pair_band recip_pme recip_exact full_terms step
(default: all in that order; stops at the first fault).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    stages = sys.argv[1:] or ["pair_plist", "pair_band", "recip_pme",
                              "recip_exact", "full_terms", "step"]
    import importlib.util
    import jax
    import jax.numpy as jnp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "runedl", os.path.join(here, "examples", "run-edl.py"))
    runedl = importlib.util.module_from_spec(spec)
    argv0, sys.argv = sys.argv, ["run-edl.py"]
    spec.loader.exec_module(runedl)
    sys.argv = argv0
    d = "/tmp/edl_real/edl_Im21"
    sim = runedl.gen_simulation(d + "/conf.gro", d + "/topol.psf",
                                d + "/ff.prm", voltage=1.0)
    ctx = sim.context
    ev = ctx.evaluator
    if ctx._carry is None:
        ctx._carry = ctx._make_carry()
    pos = ctx._carry.state.pos
    box = ctx._carry.state.box
    print(f"n_atoms={ctx.system.n_atoms} recip={ev.recip_method} "
          f"uses_band={ev.uses_band}", flush=True)

    def run(name, fn):
        print(f"--- {name} ...", flush=True)
        try:
            out = fn()
            jax.block_until_ready(out)
            leaves = jax.tree_util.tree_leaves(out)
            fin = all(bool(jnp.isfinite(l).all()) for l in leaves
                      if hasattr(l, "dtype") and
                      jnp.issubdtype(l.dtype, jnp.floating))
            print(f"    OK finite={fin}", flush=True)
        except Exception as e:
            print(f"    FAULT {type(e).__name__}: {e}", flush=True)
            return False
        return True

    for st in stages:
        if st == "pair_plist":
            cache = jax.jit(ev.make_pair_cache)(pos, box)
            ok = run("make_pair_cache", lambda: cache)
            if not ok:
                break
            if not run("pair sweep (plist cache)", lambda: jax.jit(
                    lambda p, b: ev.energy_forces(
                        p, b, want_energy=False, pair_cache=cache,
                        return_cov=True)[1])(pos, box)):
                break
        elif st == "pair_band":
            if not run("pair sweep (no cache: banded/full)", lambda: jax.jit(
                    lambda p, b: ev.energy_forces(
                        p, b, want_energy=False)[1])(pos, box)):
                break
        elif st in ("recip_pme", "recip_exact"):
            meth = st.split("_")[1]
            from openmm_velocityverlet_tpu.ops import pme, ewald
            sysm = ctx.system
            q = jnp.asarray(sysm.charges)
            if meth == "pme":
                grid = pme.choose_grid(np.asarray(box))
                if not run(f"recip pme grid={grid}", lambda: jax.jit(
                        lambda p, b: pme.reciprocal_energy_pme(
                            p, b, q, sysm.ewald_beta, grid))(pos, box)):
                    break
            else:
                if not run("recip exact k-sum", lambda: jax.jit(
                        lambda p, b: ewald.reciprocal_energy(
                            p, b, q, sysm.ewald_beta, sysm.kmax))(pos, box)):
                    break
        elif st == "full_terms":
            if not run("full energy_forces", lambda: jax.jit(
                    lambda p, b: ev.energy_forces(p, b))(pos, box)):
                break
        elif st == "step":
            if not run("one full step", lambda: (ctx.step(1),
                                                 ctx._carry.state.pos)[1]):
                break
    print("done", flush=True)


if __name__ == "__main__":
    main()
