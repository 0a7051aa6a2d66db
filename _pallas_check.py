import time
import numpy as np
import jax, jax.numpy as jnp
T0=time.time()
def mark(s): print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)
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
mark("setup")
out_d = jax.jit(lambda p: allpairs.direct_space_dense(p, box, q, t, s.ewald_beta, s.r_cutoff, 1024))(pos)
jax.block_until_ready(out_d); mark("dense done")
out_p = jax.jit(lambda p: pallas_pair.direct_space_pallas(p, box, q, t, s.ewald_beta, s.r_cutoff))(pos)
jax.block_until_ready(out_p); mark("pallas done")
for name, a, b in zip(("e_lj","e_coul","e_corr"), out_p[:3], out_d[:3]):
    print(name, float(a), float(b), "rel", abs(float(a)-float(b))/max(1e-9,abs(float(b))))
fa, fb = np.asarray(out_p[3]), np.asarray(out_d[3])
print("force max diff:", np.abs(fa-fb).max(), "rel:", np.abs(fa-fb).max()/np.abs(fb).max())
# timing in-loop
@jax.jit
def loop_p(p):
    def body(c, _):
        _,_,_,f = pallas_pair.direct_space_pallas(c, box, q, t, s.ewald_beta, s.r_cutoff)
        return c + 1e-6*f, None
    c,_ = jax.lax.scan(body, p, None, length=50)
    return c
@jax.jit
def loop_d(p):
    def body(c, _):
        _,_,_,f = allpairs.direct_space_dense(c, box, q, t, s.ewald_beta, s.r_cutoff, 1024)
        return c + 1e-6*f, None
    c,_ = jax.lax.scan(body, p, None, length=50)
    return c
jax.block_until_ready(loop_p(pos)); t0=time.time(); jax.block_until_ready(loop_p(pos)); mark(f"pallas in-loop {(time.time()-t0)/50*1e3:.2f} ms")
jax.block_until_ready(loop_d(pos)); t0=time.time(); jax.block_until_ready(loop_d(pos)); mark(f"dense  in-loop {(time.time()-t0)/50*1e3:.2f} ms")
