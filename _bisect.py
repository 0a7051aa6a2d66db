import sys, time, numpy as np
import jax, jax.numpy as jnp
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator

mode = sys.argv[1]
d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d+"conf.gro")
psf = OplsPsfFile(d+"topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d+"ff.prm")
built = psf.createSystem(prm)
integ = VVIntegrator(333, 10, 1, 40, 0.001)
if mode != "nohw":
    integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
ctx._carry = ctx._make_carry()
print("carry built", flush=True)

single = ctx._build_step_fn()
if mode in ("single", "nohw"):
    fn = jax.jit(single)
    t0=time.time(); c = fn(ctx._carry); c.state.pos.block_until_ready()
    print(f"single step ok {time.time()-t0:.0f}s", flush=True)
    t0=time.time(); c = fn(c); c.state.pos.block_until_ready()
    print(f"single step 2 ok {time.time()-t0:.2f}s", flush=True)
elif mode == "loop":
    fn = ctx._get_compiled("step_n")
    t0=time.time(); c = fn(ctx._carry, jnp.asarray(5,jnp.int32)); c.state.pos.block_until_ready()
    print(f"loop5 ok {time.time()-t0:.0f}s", flush=True)
elif mode == "rebuild":
    # force the rebuild branch
    import openmm_velocityverlet_tpu.ops.neighborlist as nbl
    nb = ctx._carry.nbrs.replace(ref_pos=ctx._carry.nbrs.ref_pos + 1.0)
    f = jax.jit(lambda nb, pos, box: nbl.maybe_rebuild(nb, pos, box, built.system.exclusions, ctx.nbr_cfg))
    t0=time.time(); out = f(nb, ctx.state.pos, ctx.state.box); out.idx.block_until_ready()
    print(f"cond-rebuild ok {time.time()-t0:.0f}s", flush=True)
print("DONE")
