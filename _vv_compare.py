import time, numpy as np, jax
from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
for middle in (True, False):
    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    integ.setUseMiddleScheme(middle)
    integ.setMaxDrudeDistance(0.02)
    ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
    ctx.set_velocities_to_temperature(333.0)
    ctx.step(20); jax.block_until_ready(ctx._carry.state.pos)
    t0=time.time(); ctx.step(300); jax.block_until_ready(ctx._carry.state.pos)
    dt=time.time()-t0
    ke = ctx.kinetic_energy()
    print(f"{'middle' if middle else 'vanilla-vv'}: {300/dt:.1f} steps/s  KE={ke:.0f}", flush=True)
