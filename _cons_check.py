import numpy as np, time
import jax, jax.numpy as jnp
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.ops import constraints as cons_mod
from openmm_velocityverlet_tpu.units import BOLTZ
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
inv_m = np.asarray(s.inv_masses)
cons = cons_mod.build_constraint_data(np.asarray(s.constraints), np.asarray(s.constraint_dist), inv_m)
print("use_clusters:", cons.use_clusters, "NCL:", cons.cl_cons.shape)
pos = jnp.asarray(gro.positions, jnp.float32)
box = jnp.asarray(gro.box, jnp.float32)
rng = np.random.default_rng(0)
sigma = np.sqrt(BOLTZ*333.0*inv_m)[:,None].astype(np.float32)
vel = jnp.asarray(sigma*rng.standard_normal((pos.shape[0],3)).astype(np.float32))
i, j = cons.pairs[:,0], cons.pairs[:,1]
d2 = cons.dist**2

# first satisfy positions from gro (gro has 2% violations) using cluster solver itself
pos_c = cons_mod.apply_position_constraints(pos, pos, box, cons, inv_m)
delta = pos_c[i]-pos_c[j]; r2 = jnp.sum(delta*delta,-1)
print("pos resid after cluster solve:", float(jnp.max(jnp.abs(r2-d2)/d2)))

new_pos = pos_c + 0.001*vel
out = cons_mod.apply_position_constraints(pos_c, new_pos, box, cons, inv_m)
delta = out[i]-out[j]; r2 = jnp.sum(delta*delta,-1)
print("pos resid after step solve:", float(jnp.max(jnp.abs(r2-d2)/d2)))

v2 = cons_mod.apply_velocity_constraints(pos_c, vel, box, cons, inv_m)
ref = pos_c[i]-pos_c[j]
rv = jnp.sum((v2[i]-v2[j])*ref, -1)
rv0 = jnp.sum((vel[i]-vel[j])*ref, -1)
print("vel resid before:", float(jnp.max(jnp.abs(rv0))), "after:", float(jnp.max(jnp.abs(rv))))
# momentum conservation: total momentum unchanged
m = np.asarray(s.masses)[:,None]
print("dP:", np.abs(np.asarray(jnp.sum(m*(v2-vel),0))).max())
