"""Bisect inside the middle step: which composition step adds ~700ms."""
import time
import numpy as np
import jax
import jax.numpy as jnp

T0 = time.time()


def mark(s):
    print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)


from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.ops import nonbonded

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d + "conf.gro")
psf = OplsPsfFile(d + "topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d + "ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                         rigidWater=True)
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
carry = ctx._make_carry()
jax.block_until_ready(carry)
mark("setup")
s = built.system
ev = ctx.evaluator
dt = ctx.data.dt
inv_m = jnp.asarray(s.inv_masses)
nbr_idx_const = carry.nbrs.idx


def bench(name, fn, *args, reps=5):
    jfn = jax.jit(fn)
    t0 = time.time()
    jax.block_until_ready(jfn(*args))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    mark(f"{name:36s} {(time.time()-t0)/reps*1e3:9.2f} ms (compile {tc:.1f}s)")


# 1. energy_forces with idx as dynamic ARG vs closure constant
bench("ef_const_idx", lambda st: ev.energy_forces(st.pos, st.box,
                                                  nbr_idx_const), carry.state)
bench("ef_dyn_idx", lambda st, idx: ev.energy_forces(st.pos, st.box, idx),
      carry.state, carry.nbrs.idx)

# 2. direct_space alone, dynamic idx
bench("direct_dyn_idx",
      lambda p, idx: nonbonded.direct_space(
          p, carry.state.box, idx, jnp.asarray(s.charges),
          jnp.asarray(s.lj_type), jnp.asarray(s.acoef), jnp.asarray(s.bcoef),
          s.ewald_beta, s.r_cutoff, None, None),
      carry.state.pos, carry.nbrs.idx)

# 3. forces + kick + drift only (carry in/out like the real step)
def core(carry):
    st = carry.state
    _, F = ev.energy_forces(st.pos, st.box, carry.nbrs.idx)
    vel = st.vel + dt * inv_m[:, None] * F
    pos = st.pos + dt * vel
    return carry.replace(state=st.replace(pos=pos, vel=vel))


bench("core_force_kick_drift", core, carry)


# 4. same but returning only the state (no nbrs passthrough)
def core2(st, idx):
    _, F = ev.energy_forces(st.pos, st.box, idx)
    vel = st.vel + dt * inv_m[:, None] * F
    pos = st.pos + dt * vel
    return st.replace(pos=pos, vel=vel)


bench("core_no_carry", core2, carry.state, carry.nbrs.idx)
mark("done")
