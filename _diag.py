import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm)
s = built.system
pos = np.asarray(gro.positions); box = gro.box
# brute force min distance among non-excluded pairs, chunked
excl = np.asarray(s.exclusions)
types = np.asarray(s.lj_type); A=np.asarray(s.acoef); B=np.asarray(s.bcoef)
n = len(pos)
best = (1e9, -1, -1); worstE = (0,-1,-1)
import sys
for i0 in range(0, n, 2000):
    print("chunk", i0, file=sys.stderr)
    p = pos[i0:i0+2000]
    dr = p[:,None,:]-pos[None,:,:]
    dr -= box*np.round(dr/box)
    r2 = (dr**2).sum(-1)
    iidx = np.arange(i0, i0+len(p))
    mask = np.ones_like(r2, bool)
    mask[np.arange(len(p)), iidx] = False
    for e in range(excl.shape[1]):
        cols = excl[iidx, e]
        ok = cols >= 0
        mask[np.where(ok)[0], np.where(ok, cols, 0)[ok]] = False
    r2m = np.where(mask, r2, 1e9)
    k = np.unravel_index(np.argmin(r2m), r2m.shape)
    if r2m[k] < best[0]: best = (r2m[k], iidx[k[0]], k[1])
    # LJ energy per pair
    a = A[types[iidx][:,None], types[None,:]]; b = B[types[iidx][:,None], types[None,:]]
    inv6 = 1/np.maximum(r2m,1e-9)**3
    e_lj = a*a*inv6*inv6 - b*inv6
    e_lj = np.where(r2m<1.44, e_lj, 0)
    k2 = np.unravel_index(np.argmax(e_lj), e_lj.shape)
    if e_lj[k2] > worstE[0]: worstE = (e_lj[k2], iidx[k2[0]], k2[1])
print("min nonexcluded dist:", np.sqrt(best[0]), "pair", best[1], best[2],
      psf.topology.atom_names[best[1]], psf.topology.atom_names[best[2]],
      psf.topology.residue_ids[best[1]], psf.topology.residue_ids[best[2]])
print("worst LJ pair:", worstE, psf.topology.atom_names[worstE[1]], psf.topology.atom_names[worstE[2]],
      "types", psf.topology.atom_types[worstE[1]], psf.topology.atom_types[worstE[2]],
      "resid", psf.topology.residue_ids[worstE[1]], psf.topology.residue_ids[worstE[2]])
