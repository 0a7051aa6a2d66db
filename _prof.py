"""Per-piece TPU timing of the MD step for bulk_Im21."""
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
from openmm_velocityverlet_tpu.ops import neighborlist as nbl
from openmm_velocityverlet_tpu.ops import nonbonded, constraints as cons_mod
from openmm_velocityverlet_tpu.integrators import stepping

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d + "conf.gro")
psf = OplsPsfFile(d + "topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d + "ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                         rigidWater=True)
mark("createSystem")
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
t0 = time.time()
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
mark(f"Context init ({time.time()-t0:.1f}s)")
ctx.set_velocities_to_temperature(333.0)
s = built.system
print("n_atoms", s.n_atoms, "n_cons", s.constraints.shape,
      "excl", s.exclusions.shape, "exc14", s.exc_idx.shape,
      "kmax", s.kmax, "beta", s.ewald_beta,
      "nbr K", ctx.nbr_cfg.capacity if ctx.nbr_cfg else None,
      "dims", ctx.nbr_cfg.dims if ctx.nbr_cfg else None,
      "cellM", ctx.nbr_cfg.cell_capacity if ctx.nbr_cfg else None,
      "atom_cons A", ctx.cons.atom_cons.shape, flush=True)

carry = ctx._make_carry()
st = carry.state
pos, box, vel = st.pos, st.box, st.vel
nbrs = carry.nbrs
ev = ctx.evaluator


def bench(name, fn, *args, reps=10):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    mark(f"{name:28s} {dt*1e3:9.2f} ms/call   (compile {t_compile:.1f}s)")
    return out


bench("nbr_build", lambda p: nbl.build(p, box, s.exclusions, ctx.nbr_cfg), pos)
bench("direct_space",
      lambda p: nonbonded.direct_space(p, box, nbrs.idx, s.charges, s.lj_type,
                                       s.acoef, s.bcoef, s.ewald_beta,
                                       s.r_cutoff, s.lj_group,
                                       s.lj_group_allowed), pos)
bench("excl_corr",
      lambda p: nonbonded.exclusion_correction(p, box, s.exclusions, s.charges,
                                               s.ewald_beta), pos)
bench("exceptions",
      lambda p: nonbonded.exception_terms(p, box, s.exc_idx, s.exc_qq,
                                          s.exc_c6, s.exc_c12), pos)
bench("smooth_grad (bonded+recip)",
      lambda p: jax.value_and_grad(ev._smooth_energy, has_aux=True)(p, box),
      pos)
bench("energy_forces (all)",
      lambda p: ev.energy_forces(p, box, nbrs.idx), pos)
bench("pos_constraints",
      lambda p: cons_mod.apply_position_constraints(
          p, p + 1e-4, box, ctx.cons, s.inv_masses), pos)
bench("vel_constraints",
      lambda v: cons_mod.apply_velocity_constraints(
          pos, v, box, ctx.cons, s.inv_masses), vel)
data = ctx.data
bench("nh_scale",
      lambda v: stepping.nh_scale_velocities(
          v, s.masses, s.inv_masses, s.particle_mol_id, s.mol_masses,
          s.mol_inv_masses, data, st.nh_eta, st.nh_eta_dot, st.nh_eta_dotdot),
      vel)
single = ctx._build_step_fn()
bench("full_step", single, carry, reps=5)
mark("done")
