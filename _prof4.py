"""Profile the all-pairs step: piece costs + block-size sweep + scan slope."""
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
from openmm_velocityverlet_tpu.ops import allpairs, nonbonded
from openmm_velocityverlet_tpu.ops import constraints as cons_mod
from openmm_velocityverlet_tpu.integrators import stepping

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
st = carry.state
pos, box, vel = st.pos, st.box, st.vel
q = jnp.asarray(s.charges)


def bench(name, fn, *args, reps=10):
    jfn = jax.jit(fn)
    t0 = time.time()
    jax.block_until_ready(jfn(*args))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    mark(f"{name:30s} {dt*1e3:9.2f} ms (compile {tc:.1f}s)")
    return dt


for rb in (512, 1024, 2048, 4096):
    bench(f"direct_dense rb={rb}",
          lambda p, rb=rb: allpairs.direct_space_dense(
              p, box, q, ev.pair_tables, s.ewald_beta, s.r_cutoff,
              row_block=rb), pos)

bench("excl_corr", lambda p: nonbonded.exclusion_correction(
    p, box, s.exclusions, s.charges, s.ewald_beta), pos)
bench("exceptions", lambda p: nonbonded.exception_terms(
    p, box, s.exc_idx, s.exc_qq, s.exc_c6, s.exc_c12), pos)
bench("smooth_grad", lambda p: jax.value_and_grad(
    ev._smooth_energy, has_aux=True)(p, box), pos)
bench("energy_forces", lambda p: ev.energy_forces(p, box), pos)
bench("pos_cons", lambda p: cons_mod.apply_position_constraints(
    p, p + 0.001 * vel, box, ctx.cons, s.inv_masses), pos)
bench("vel_cons", lambda v: cons_mod.apply_velocity_constraints(
    pos, v, box, ctx.cons, s.inv_masses), vel)
bench("nh_scale", lambda v: stepping.nh_scale_velocities(
    v, s.masses, s.inv_masses, s.particle_mol_id, s.mol_masses,
    s.mol_inv_masses, ctx.data, st.nh_eta, st.nh_eta_dot, st.nh_eta_dotdot),
    vel)
bench("hardwall", lambda p: stepping.apply_hardwall(
    p, vel, s.masses, s.inv_masses, box, ctx.data), pos)

single = ctx._build_step_fn()
bench("full_step", single, carry, reps=5)

# marginal per-step cost inside one program
stepn = ctx._get_compiled("step_n")
for n in (10, 50):
    narr = jnp.asarray(n, jnp.int32)
    jax.block_until_ready(stepn(carry, narr))
    t0 = time.time()
    out = stepn(carry, narr)
    jax.block_until_ready(out)
    mark(f"step_n({n}): {(time.time()-t0)/n*1e3:.2f} ms/step")
mark("done")
