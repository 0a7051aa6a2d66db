"""Bisect the full-step cost + measure host<->device transfer speed."""
import time
import numpy as np
import jax
import jax.numpy as jnp

T0 = time.time()


def mark(s):
    print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)


# -- transfer speed first (cheap) --
for size in [(1,), (9250, 3), (1 << 20,)]:
    x = jnp.ones(size, jnp.float32)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(5):
        np.asarray(x)
    mark(f"D2H {np.prod(size)*4/1e6:8.3f} MB: {(time.time()-t0)/5*1e3:8.2f} ms")
    y = np.ones(size, np.float32)
    t0 = time.time()
    for _ in range(5):
        jax.block_until_ready(jnp.asarray(y) + 0)
    mark(f"H2D {np.prod(size)*4/1e6:8.3f} MB: {(time.time()-t0)/5*1e3:8.2f} ms")

from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d + "conf.gro")
psf = OplsPsfFile(d + "topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d + "ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                         rigidWater=True)
mark("createSystem")
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
mark("Context")
carry = ctx._make_carry()
jax.block_until_ready(carry)
mark("carry")


def bench(name, fn, arg, reps=5):
    jfn = jax.jit(fn)
    t0 = time.time()
    jax.block_until_ready(jfn(arg))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jfn(arg)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    mark(f"{name:34s} {dt*1e3:9.2f} ms/call (compile {tc:.1f}s)")


from openmm_velocityverlet_tpu.ops import constraints as cons_mod
from openmm_velocityverlet_tpu.integrators import stepping

# full step baseline
bench("full_step", ctx._build_step_fn(), carry)

# no constraints
saved_cons = ctx.cons
ctx.cons = cons_mod.build_constraint_data(
    np.zeros((0, 2), np.int32), np.zeros((0,), np.float32),
    np.asarray(built.system.inv_masses))
bench("step_no_constraints", ctx._build_step_fn(), carry)
ctx.cons = saved_cons

# constraints with capped iterations
ctx.cons = saved_cons.replace(max_iterations=10)
bench("step_cons_max10", ctx._build_step_fn(), carry)
ctx.cons = saved_cons

# no hardwall
saved_data = ctx.data
ctx.data = saved_data.replace(max_drude_distance=0.0)
bench("step_no_hardwall", ctx._build_step_fn(), carry)
ctx.data = saved_data

# no thermostat: nh arrays empty
ctx.data = saved_data.replace(
    nh_normal=jnp.zeros((0,), jnp.int32),
    nh_pairs=jnp.zeros((0, 2), jnp.int32))
bench("step_no_nh", ctx._build_step_fn(), carry)
ctx.data = saved_data

# hardwall alone
st = carry.state
bench("hardwall", lambda p: stepping.apply_hardwall(
    p, st.vel, built.system.masses, built.system.inv_masses, st.box,
    ctx.data), st.pos)

# constraints with REAL displaced positions (dt * v)
disp = st.pos + 0.001 * st.vel
bench("pos_cons_real", lambda pn: cons_mod.apply_position_constraints(
    st.pos, pn, st.box, saved_cons, built.system.inv_masses), disp)
bench("vel_cons_real", lambda v: cons_mod.apply_velocity_constraints(
    st.pos, v, st.box, saved_cons, built.system.inv_masses), st.vel)
mark("done")
