"""Langevin from a TGNH-relaxed configuration."""
import numpy as np, jax
from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from tests.test_tgnh import drude_temperature_partition
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(s, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
ctx.step(2000)
tc, ta, td = drude_temperature_partition(s, ctx.state.vel)
print(f"after TGNH 2000: T_COM={tc:.1f} T_atom={ta:.1f} T_drude={td:.2f}", flush=True)
pos2 = ctx.get_positions(); vel2 = ctx.get_velocities()

integ2 = VVIntegrator(333, 10, 1, 40, 0.00025)
integ2.setMaxDrudeDistance(0.02)
for i in range(s.n_atoms):
    integ2.addParticleLangevin(i)
ctx2 = Context(s, integ2, positions=pos2, box=ctx.get_box())
ctx2.set_velocities(vel2)
for k in range(4):
    ctx2.step(2000)
    tc, ta, td = drude_temperature_partition(s, ctx2.state.vel)
    print(f"langevin(dt/4) step {(k+1)*2000}: T_COM={tc:.1f} T_atom={ta:.1f} T_drude={td:.2f}", flush=True)
