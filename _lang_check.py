import numpy as np
from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator
from openmm_velocityverlet_tpu.units import BOLTZ
from tests.test_tgnh import make_polarizable_dumbbell_fluid, drude_temperature_partition

system, pos, box = make_polarizable_dumbbell_fluid()
integ = VVIntegrator(300.0, 10.0, 1.0, 40.0, 0.001)
integ.setMaxDrudeDistance(0.02)
integ.setFriction(5.0)
integ.setDrudeFriction(20.0)
for i in range(system.n_atoms):
    integ.addParticleLangevin(i)
ctx = Context(system, integ, positions=pos, box=box)
ctx.set_velocities_to_temperature(300.0)
ctx.step(3000)
ts = []
for _ in range(10):
    ctx.step(300)
    ts.append(drude_temperature_partition(system, ctx.state.vel))
tc, ta, td = np.mean(ts, axis=0)
print(f"T_COM={tc:.1f} T_atom={ta:.1f} T_drude={td:.2f}")
