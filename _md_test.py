import time, numpy as np
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.units import BOLTZ

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)

integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
print("TG DOF:", np.asarray(ctx.data.temp_group_dof), "NkbT:", np.asarray(ctx.data.temp_group_nkbt))
print("num temp groups:", ctx.data.num_temp_groups, "use_com:", ctx.data.use_com_temp_group)

t0=time.time(); ctx.step(20); t1=time.time()
print(f"compile+20 steps: {t1-t0:.1f}s")
t0=time.time(); ctx.step(200); t1=time.time()
sps = 200/(t1-t0)
print(f"200 steps: {t1-t0:.2f}s -> {sps:.1f} steps/s = {sps*0.001*86400/1000:.1f} ns/day")

# temperature partition check (DrudeTemperatureReporter math)
import jax.numpy as jnp
from openmm_velocityverlet_tpu.integrators import stepping
vel = ctx.state.vel; masses = built.system.masses
s = built.system
com = stepping.com_velocities(vel, masses, s.particle_mol_id, s.mol_inv_masses)
ke_com = 0.5*jnp.sum(s.mol_masses*jnp.sum(com**2,-1))
vrel = vel - com[s.particle_mol_id]
d_idx, p_idx = s.drude_pairs[:,0], s.drude_pairs[:,1]
m1, m2 = masses[d_idx], masses[p_idx]
cm = (m1[:,None]*vrel[d_idx]+m2[:,None]*vrel[p_idx])/(m1+m2)[:,None]
rel = vrel[d_idx]-vrel[p_idx]
mu = m1*m2/(m1+m2)
ke_drude = 0.5*jnp.sum(mu*jnp.sum(rel**2,-1))
ke_all = 0.5*jnp.sum(masses[:,None]*vrel**2)
ke_atom = ke_all - 0.5*jnp.sum(m1[:,None]*vrel[d_idx]**2) - 0.5*jnp.sum(m2[:,None]*vrel[p_idx]**2) + 0.5*jnp.sum((m1+m2)[:,None]*cm**2)
dof = np.asarray(ctx.data.temp_group_dof)
print(f"T_com   = {2*ke_com/(dof[1]*BOLTZ):.1f} K (target 333)")
print(f"T_atom  = {2*ke_atom/(dof[0]*BOLTZ):.1f} K (target 333)")
print(f"T_drude = {2*ke_drude/(dof[2]*BOLTZ):.2f} K (target 1)")
print("E_pot:", ctx.potential_energy())
