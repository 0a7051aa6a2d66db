import numpy as np, jax.numpy as jnp
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.ops import allpairs
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
t = allpairs.build_pair_tables(s.n_atoms, s.lj_type, s.acoef, s.bcoef, s.exclusions)
print("factorized:", t["factorized"], "NC:", t["corrA"].shape)
pos = jnp.asarray(gro.positions, jnp.float32); box = jnp.asarray(gro.box, jnp.float32)
q = jnp.asarray(s.charges)
out_f = allpairs.direct_space_dense(pos, box, q, t, s.ewald_beta, s.r_cutoff, 1024)
t2 = dict(t); t2["factorized"] = False
out_e = allpairs.direct_space_dense(pos, box, q, t2, s.ewald_beta, s.r_cutoff, 1024)
for name, a, b in zip(("e_lj","e_coul","e_corr"), out_f[:3], out_e[:3]):
    print(name, float(a), float(b))
fa, fe = np.asarray(out_f[3]), np.asarray(out_e[3])
print("force max diff:", np.abs(fa-fe).max(), "rel:", np.abs(fa-fe).max()/np.abs(fe).max())
