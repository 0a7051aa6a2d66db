import time, numpy as np
T0=time.time()
def mark(s): print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator
mark("imports")
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
mark("createSystem")
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
mark("Context")
ctx.set_velocities_to_temperature(333.0)
mark("set_velocities")
import jax
ctx.step(1)
jax.block_until_ready(ctx._carry.state.pos)
mark("first step (compile)")
ctx.step(19)
jax.block_until_ready(ctx._carry.state.pos)
mark("19 more steps")
t0=time.time(); ctx.step(500); jax.block_until_ready(ctx._carry.state.pos); dt=time.time()-t0
sps=500/dt
mark(f"500 steps: {dt:.2f}s -> {sps:.1f} steps/s = {sps*0.001*86400/1000:.1f} ns/day")
ke = ctx.kinetic_energy()
ep = ctx.potential_energy_terms()
mark(f"KE={ke:.1f}  PE terms: " + " ".join(f"{k}={v:.1f}" for k,v in ep.items()))
