import numpy as np, os
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
A = np.asarray(s.acoef, np.float64); B = np.asarray(s.bcoef, np.float64)
sA = np.sqrt(np.diag(A)); sB = np.sqrt(np.diag(B))
relA = np.abs(A - np.outer(sA,sA)) / np.maximum(1e-30, np.abs(A))
bad = np.argwhere(relA > 1e-5)
print("entries rel>1e-5:", len(bad))
for i,j in bad[:20]:
    print(i,j, A[i,j], sA[i]*sA[j], relA[i,j])
print("max rel among 'good':", relA[relA<=1e-5].max())
