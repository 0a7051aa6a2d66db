import numpy as np, time, os, jax
jax.config.update("jax_platforms", "cpu")
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator
for name in ("bulk_Im21", "bulk_Im81", "bulk_ImB1", "bulk_ImO1"):
    d = f"/root/reference/examples/models/{name}/"
    t0 = time.time()
    gro = GroFile(d + "conf.gro")
    psf = OplsPsfFile(d + "topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds", rigidWater=True)
    s = built.system
    integ = VVIntegrator(333, 10, 1, 40, 0.001)
    ctx = Context(s, integ, positions=gro.positions, box=gro.box)
    terms = ctx.potential_energy_terms()
    bad = [k for k, v in terms.items() if not np.isfinite(v)]
    print(f"{name}: N={s.n_atoms} drude={s.drude_pairs.shape[0]} thole={s.thole_sites.shape[0]} "
          f"vsites={s.vsite_index.shape[0]} cons={s.constraints.shape[0]} "
          f"E={sum(terms.values()):.1f} bad={bad} ({time.time()-t0:.1f}s)", flush=True)
