import numpy as np, time
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
for i in range(s.n_atoms):
    integ.addParticleLangevin(i)
print("friction", integ.getFriction(), integ.getDrudeFriction(), flush=True)
ctx = Context(s, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
print("ld sizes", ctx.data.ld_normal.shape, ctx.data.ld_pairs.shape,
      "nh sizes", ctx.data.nh_normal.shape, ctx.data.nh_pairs.shape, flush=True)
for k in range(4):
    ctx.step(500)
    tc, ta, td = drude_temperature_partition(s, ctx.state.vel)
    print(f"step {(k+1)*500}: T_COM={tc:.1f} T_atom={ta:.1f} T_drude={td:.2f}", flush=True)
