import numpy as np, jax, jax.numpy as jnp
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.ops import nonbonded, term_forces
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
pos = jnp.asarray(gro.positions, jnp.float32); box = jnp.asarray(gro.box, jnp.float32)
e_q, e_lj, f_old = nonbonded.exception_terms(pos, box, s.exc_idx, s.exc_qq, s.exc_c6, s.exc_c12)
tt, ti, tn = term_forces.build_term_tables(s)
en, f_new = term_forces.energies_and_forces(pos, box, tt, ti, tn)
print("exc_coul old", float(e_q), "new", float(en["exception_coul"]))
print("exc_lj   old", float(e_lj), "new", float(en["exception_lj"]))
