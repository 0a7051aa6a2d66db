import time, numpy as np
t0=time.time()
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
print(f"parse: {time.time()-t0:.1f}s; atoms={psf.topology.n_atoms}, bonds={len(psf.bonds)}, drude_pairs={len(psf.drude_pair_list)}, angles={len(psf.angles)}, dihedrals={len(psf.dihedrals)}, impropers={len(psf.impropers)}")
t0=time.time()
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
print(f"createSystem: {time.time()-t0:.1f}s")
s = built.system
print("n_mol:", s.n_molecules, "constraints:", s.constraints.shape, "exclusions E:", s.exclusions.shape, "exceptions X:", s.exc_idx.shape, "thole:", s.thole_sites.shape, "beta:", s.ewald_beta, "kmax:", s.kmax)
# TT damping donors
donors = [a.idx for a in psf.atom_list if a.attype == 'HO']
print("donors:", len(donors))
