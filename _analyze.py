import numpy as np, os
os.environ["JAX_PLATFORMS"]="cpu"
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
mol_id = np.asarray(s.particle_mol_id)
n = len(mol_id)
# contiguity: mol ids nondecreasing?
print("mol contiguous:", bool(np.all(np.diff(mol_id) >= 0)))
counts = np.bincount(mol_id)
print("n_mol", len(counts), "max mol size", counts.max(), "min", counts.min())
excl = np.asarray(s.exclusions)
# exclusion bandwidth in current ordering
ii = np.repeat(np.arange(n), excl.shape[1])
jj = excl.reshape(-1)
mask = jj >= 0
bw = np.abs(ii[mask]-jj[mask])
print("exclusion bandwidth: max", bw.max(), "p99", np.percentile(bw,99),
      ">63:", int((bw>63).sum()), "of", mask.sum())
print("n LJ types:", s.acoef.shape)
A = np.asarray(s.acoef); B = np.asarray(s.bcoef)
sA = np.sqrt(np.maximum(np.diag(A),0)); sB = np.sqrt(np.maximum(np.diag(B),0))
geoA = np.outer(sA,sA); geoB = np.outer(sB,sB)
nb_mask = (np.abs(A-geoA) > 1e-6*np.maximum(1e-10,np.abs(A))) | (np.abs(B-geoB)>1e-6*np.maximum(1e-10,np.abs(B)))
print("non-geometric A/B entries:", int(nb_mask.sum()), "types involved:", np.unique(np.where(nb_mask)[0]).tolist())
# constraints coupling
cons = np.asarray(s.constraints)
from collections import Counter
deg = Counter()
for a,b in cons:
    deg[a]+=1; deg[b]+=1
print("constraints:", len(cons), "max atom degree:", max(deg.values()))
print("exc14 shape", s.exc_idx.shape, "thole", s.thole_sites.shape, "drude", s.drude_pairs.shape, "vsites", s.vsite_index.shape)
print("box", np.asarray(gro.box), "cutoff", s.r_cutoff)
m = np.asarray(s.masses)
print("massless", int((m==0).sum()), "drude-mass", float(m[np.asarray(s.drude_pairs)[:,0]].max() if len(s.drude_pairs) else 0))
