import time, numpy as np
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)

integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
t0=time.time()
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
print(f"context: {time.time()-t0:.1f}s")
t0=time.time()
terms = ctx.potential_energy_terms()
print(f"energy eval (compile): {time.time()-t0:.1f}s")
for k in sorted(terms): print(f"  {k:18s} {terms[k]:14.2f}")
print("TOTAL:", sum(terms.values()))
print("groups:", {k: round(v,1) for k,v in ctx.group_energies().items()})
f = ctx.get_forces()
print("force max/rms:", np.abs(f).max(), np.sqrt((f**2).mean()))
