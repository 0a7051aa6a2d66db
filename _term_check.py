import numpy as np
import jax, jax.numpy as jnp
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.ops import bonded, drude, term_forces
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
pos = jnp.asarray(gro.positions, jnp.float32)
rng = np.random.default_rng(1)
pos = pos + jnp.asarray(rng.normal(scale=0.005, size=pos.shape).astype(np.float32))
box = jnp.asarray(gro.box, jnp.float32)

def old_e(p):
    terms = bonded.bonded_energy(s, p, box)
    terms["drude"] = drude.drude_spring_energy(p, box, s.drude_pairs, s.drude_k3, s.drude_k1, s.drude_k2, s.drude_aniso)
    terms["thole"] = drude.thole_energy(p, box, s.thole_sites, s.thole_qq, s.thole_screen)
    return sum(terms.values()), terms

(e_old, terms_old), g_old = jax.value_and_grad(old_e, has_aux=True)(pos)
from openmm_velocityverlet_tpu.ops import nonbonded
_, _, f_exc_old = nonbonded.exception_terms(pos, box, s.exc_idx, s.exc_qq, s.exc_c6, s.exc_c12)
tt, ti, tn = term_forces.build_term_tables(s)
terms_new, f_new = term_forces.energies_and_forces(pos, box, tt, ti, tn)
for k in sorted(set(terms_new) & set(terms_old)):
    print(f"{k:14s} old={float(terms_old[k]):14.4f} new={float(terms_new[k]):14.4f}")
f_old = -np.asarray(g_old) + np.asarray(f_exc_old)
f_new = np.asarray(f_new)
err = np.abs(f_new - f_old).max()
scale = np.abs(f_old).max()
print("max |f_new - f_old| =", err, " max|f| =", scale, " rel =", err/scale)
