import os; os.environ["JAX_PLATFORMS"]="cpu"
import time, numpy as np
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm)
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
t0=time.time(); ctx.step(1); print(f"step1 ok {time.time()-t0:.0f}s", flush=True)
t0=time.time(); ctx.step(3); print(f"step3 ok {time.time()-t0:.1f}s", flush=True)
print("E:", ctx.potential_energy(), "KE:", ctx.kinetic_energy())
v = ctx.get_velocities(); p = ctx.get_positions()
print("finite:", np.isfinite(v).all(), np.isfinite(p).all())
