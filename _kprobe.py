import time, numpy as np, jax, jax.numpy as jnp
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.ops import allpairs, pallas_pair
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
t = allpairs.build_pair_tables(s.n_atoms, s.lj_type, s.acoef, s.bcoef, s.exclusions)
pos = jnp.asarray(gro.positions, jnp.float32); box = jnp.asarray(gro.box, jnp.float32)
q = jnp.asarray(s.charges)
@jax.jit
def loop(p):
    def body(c, _):
        _,_,_,f = pallas_pair.direct_space_pallas(c, box, q, t, s.ewald_beta, s.r_cutoff)
        return c + 1e-7*f, None
    c,_ = jax.lax.scan(body, p, None, length=50)
    return c
jax.block_until_ready(loop(pos)); t0=time.time(); jax.block_until_ready(loop(pos))
print(f"pair kernel in-loop: {(time.time()-t0)/50*1e3:.2f} ms", flush=True)
