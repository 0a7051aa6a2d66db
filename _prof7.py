"""In-loop profile: new constraints + force-term isolation."""
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
from openmm_velocityverlet_tpu.ops import allpairs, nonbonded, ewald, bonded, drude
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
dt_ = ctx.data.dt
inv_m = np.asarray(s.inv_masses)
q = jnp.asarray(s.charges)


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
    mark(f"{name:34s} {(time.time()-t0)/50*1e3:8.2f} ms/step (compile {tc:.0f}s)")


# 1. full step, new exact constraints
single = ctx._build_step_fn()

# 2. force-term isolation loops: drift positions with only one term
def force_loop(force_fn):
    def stage(cr):
        st = cr.state
        F = force_fn(st.pos, st.box)
        vel = st.vel + dt_ * inv_m[:, None] * F
        pos = st.pos + dt_ * vel
        return cr.replace(state=st.replace(pos=pos, vel=vel))
    return stage


from openmm_velocityverlet_tpu.ops import pallas_pair

def f_direct(p, box):
    _, _, _, f = pallas_pair.direct_space_pallas(p, box, q, ev.pair_tables,
                                                 s.ewald_beta, s.r_cutoff)
    return f

def f_direct_1024(p, box):
    _, _, _, f = pallas_pair.direct_space_pallas(p, box, q, ev.pair_tables,
                                                 s.ewald_beta, s.r_cutoff,
                                                 ts=1024)
    return f


def f_smooth(p, box):
    (_, _), g = jax.value_and_grad(ev._smooth_energy, has_aux=True)(p, box)
    return -g


def f_terms(p, box):
    from openmm_velocityverlet_tpu.ops import term_forces
    tt, ti, tn = ev.term_tables
    _, f = term_forces.energies_and_forces(p, box, tt, ti, tn)
    return f


def f_recip(p, box):
    g = jax.grad(lambda pp: ewald.reciprocal_energy(
        pp, box, q, s.ewald_beta, s.kmax, chunk=4096))(p)
    return -g


timeit("loop smooth only", force_loop(f_smooth))
timeit("loop recip only", force_loop(f_recip))
timeit("loop terms only", force_loop(f_terms))
def f_exc_ev(p, box):
    _, f = ev.energy_forces(p, box)
    return f
timeit("loop all forces", force_loop(f_exc_ev))

# 3. constraints-only loops
cons = ctx.cons


from openmm_velocityverlet_tpu.integrators import stepping as stp
def stage_thermo_hw(cr):
    st = cr.state
    vel, eta, eta_dot, eta_dd, _ = stp.nh_scale_velocities(
        st.vel, np.asarray(s.masses), np.asarray(s.inv_masses),
        s.particle_mol_id, s.mol_masses, s.mol_inv_masses, ctx.data,
        st.nh_eta, st.nh_eta_dot, st.nh_eta_dotdot)
    hw_pos, vel = stp.apply_hardwall(st.pos, vel, np.asarray(s.masses),
                                     np.asarray(s.inv_masses), st.box,
                                     ctx.data)
    return cr.replace(state=st.replace(pos=hw_pos, vel=vel, nh_eta=eta,
                                       nh_eta_dot=eta_dot,
                                       nh_eta_dotdot=eta_dd))

def stage_cons(cr):
    st = cr.state
    newp = st.pos + dt_ * st.vel
    conp = cons_mod.apply_position_constraints(st.pos, newp, st.box, cons,
                                               inv_m)
    vel = cons_mod.apply_velocity_constraints(conp, st.vel, st.box, cons,
                                              inv_m)
    return cr.replace(state=st.replace(pos=conp, vel=vel))


timeit("loop cluster cons only", stage_cons)
timeit("loop thermo+hardwall", stage_thermo_hw)
mark("done")
