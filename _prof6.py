"""Cumulative in-loop (scan50) cost of each step stage."""
import time
from functools import partial
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
cons = ctx.cons
data = ctx.data
dt_ = data.dt
inv_m = np.asarray(s.inv_masses)
masses = np.asarray(s.masses)


def loop50(stage_fn):
    @jax.jit
    def run(carry):
        c, _ = jax.lax.scan(lambda c, _: (stage_fn(c), None), carry, None,
                            length=50)
        return c
    return run


def timeit(name, fn):
    jfn = loop50(fn)
    t0 = time.time()
    jax.block_until_ready(jfn(carry))
    tc = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(jfn(carry))
    mark(f"{name:30s} {(time.time()-t0)/50*1e3:8.2f} ms/step (compile {tc:.0f}s)")


def make_step(vel_cons=False, thermo=False, pos_cons=False, hardwall=False,
              cm=False, fixed_iters=0):
    def stage(cr):
        st = cr.state
        pos, err, vel, box = st.pos, st.pos_err, st.vel, st.box
        if cm:
            mom = jnp.sum(masses[:, None] * vel, 0)
            vcm = mom / np.sum(masses)
            vel = jnp.where(inv_m[:, None] > 0, vel - vcm, vel)
        _, F = ev.energy_forces(pos, box)
        key, _ = jax.random.split(st.rng_key)
        vel = vel + dt_ * inv_m[:, None] * F
        if vel_cons:
            vel = cons_mod.apply_velocity_constraints(pos, vel, box, cons,
                                                      inv_m)
        half1 = 0.5 * dt_ * vel
        if thermo:
            vel, eta, eta_dot, eta_dd, _ = stepping.nh_scale_velocities(
                vel, masses, inv_m, s.particle_mol_id, s.mol_masses,
                s.mol_inv_masses, data, st.nh_eta, st.nh_eta_dot,
                st.nh_eta_dotdot)
            st = st.replace(nh_eta=eta, nh_eta_dot=eta_dot,
                            nh_eta_dotdot=eta_dd)
        delta = half1 + 0.5 * dt_ * vel
        new_pos, new_err = stepping.compensated_add(pos, err, delta)
        if pos_cons:
            con_pos = cons_mod.apply_position_constraints(pos, new_pos, box,
                                                          cons, inv_m)
            vel = vel + (con_pos - new_pos) / dt_
            new_pos, new_err = stepping.compensated_add(new_pos, new_err,
                                                        con_pos - new_pos)
        if hardwall:
            hw_pos, vel = stepping.apply_hardwall(new_pos, vel, masses, inv_m,
                                                  box, data)
            new_pos, new_err = stepping.compensated_add(new_pos, new_err,
                                                        hw_pos - new_pos)
        st = st.replace(pos=new_pos, pos_err=new_err, vel=vel, rng_key=key,
                        step=st.step + 1, time=st.time + dt_)
        return cr.replace(state=st)
    return stage


timeit("core", make_step())
timeit("core+cm", make_step(cm=True))
timeit("core+velcons", make_step(vel_cons=True))
timeit("core+thermo", make_step(thermo=True))
timeit("core+poscons", make_step(pos_cons=True))
timeit("core+hardwall", make_step(hardwall=True))
timeit("all", make_step(True, True, True, True, True))
mark("done")
