import numpy as np, os, time
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
pos = np.asarray(gro.positions, np.float32)
box = np.asarray(gro.box, np.float32)
rng = np.random.default_rng(0)
sigma = np.sqrt(BOLTZ*333.0*inv_m)[:,None].astype(np.float32)
vel = (sigma*rng.standard_normal((len(pos),3))).astype(np.float32)
dt = 0.001
new_pos = pos + dt*vel

i, j = np.asarray(cons.pairs[:,0]), np.asarray(cons.pairs[:,1])
d2 = np.asarray(cons.dist)**2

def residual(p):
    delta = p[i]-p[j]
    r2 = np.sum(delta*delta,-1)
    return np.max(np.abs(r2-d2)/d2)

print("initial pos violation:", residual(pos), "after drift:", residual(new_pos))

# SOR Jacobi iterations, f32
for omega in [1.0, 1.3, 1.5, 1.8]:
    p = jnp.asarray(new_pos)
    ref = jnp.asarray(pos[i]-pos[j])
    im = jnp.asarray(inv_m); ims = jnp.asarray(np.asarray(cons.inv_mass_sum))
    cid = jnp.maximum(jnp.asarray(cons.atom_cons),0)
    valid = (jnp.asarray(cons.atom_cons)>=0).astype(jnp.float32)
    sign = jnp.asarray(cons.atom_sign)
    hist=[]
    for it in range(40):
        delta = p[jnp.asarray(i)] - p[jnp.asarray(j)]
        r2 = jnp.sum(delta*delta,-1)
        diff = r2 - jnp.asarray(d2)
        denom = 2.0*ims*jnp.sum(delta*ref,-1)
        g = omega*diff/jnp.where(jnp.abs(denom)>1e-12, denom, 1e-12)
        contrib = (g[cid]*valid*sign)[...,None]*ref[cid]
        p = p - im[:,None]*jnp.sum(contrib,axis=1)
        if it in (4,9,14,19,29,39):
            hist.append((it+1, float(residual(np.asarray(p)))))
    print("omega",omega, "rel r2 err:", hist)
