"""Real-system Langevin debug: OU-only (no forces) and no-hardwall variants."""
import numpy as np, time, jax, jax.numpy as jnp
from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.integrators import stepping
from tests.test_tgnh import drude_temperature_partition
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
s = built.system
integ = VVIntegrator(333, 10, 1, 40, 0.001)
for i in range(s.n_atoms):
    integ.addParticleLangevin(i)
ctx = Context(s, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)

# A) OU alone: apply langevin_ou_update 2000 times to the initial velocities
vel = ctx.state.vel
key = jax.random.PRNGKey(0)
@jax.jit
def ou_n(vel, key):
    def body(c, _):
        v, k = c
        k, kl = jax.random.split(k)
        return (stepping.langevin_ou_update(v, np.asarray(s.masses), kl, ctx.data), k), None
    (v, k), _ = jax.lax.scan(body, (vel, key), None, length=2000)
    return v
v2 = ou_n(vel, key)
tc, ta, td = drude_temperature_partition(s, v2)
print(f"OU only:      T_COM={tc:.1f} T_atom={ta:.1f} T_drude={td:.2f}", flush=True)

# B) full dynamics without hardwall
integ2 = VVIntegrator(333, 10, 1, 40, 0.001)
integ2.setMaxDrudeDistance(0.0)
for i in range(s.n_atoms):
    integ2.addParticleLangevin(i)
ctx2 = Context(s, integ2, positions=gro.positions, box=gro.box)
ctx2.set_velocities_to_temperature(333.0)
for k in range(3):
    ctx2.step(700)
    tc, ta, td = drude_temperature_partition(s, ctx2.state.vel)
    print(f"no-hardwall step {(k+1)*700}: T_COM={tc:.1f} T_atom={ta:.1f} T_drude={td:.2f}", flush=True)
