import numpy as np, jax, jax.numpy as jnp, time
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
fp = np.asarray(jax.jit(lambda p: pallas_pair.direct_space_pallas(p, box, q, t, s.ewald_beta, s.r_cutoff))(pos)[3])
fd = np.asarray(jax.jit(lambda p: allpairs.direct_space_dense(p, box, q, t, s.ewald_beta, s.r_cutoff, 1024))(pos)[3])
diff = np.abs(fp-fd).max(axis=1)
order = np.argsort(-diff)[:8]
dp = np.asarray(s.drude_pairs)
drude_set = set(dp[:,0].tolist())
for i in order:
    print(f"atom {i} diff {diff[i]:.3f} |fp| {np.abs(fp[i]).max():.1f} |fd| {np.abs(fd[i]).max():.1f} isdrude {i in drude_set} q {float(q[i]):.3f}")
print("mean diff", diff.mean(), "p99", np.percentile(diff, 99))
rel = diff/ (np.abs(fd).max(axis=1)+1.0)
print("max per-atom rel:", rel.max(), "at", int(np.argmax(rel)))
