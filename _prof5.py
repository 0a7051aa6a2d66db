"""Loop-overhead experiments: scan vs fori, donation, fixed-iter constraints."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

T0 = time.time()


def mark(s):
    print(f"[{time.time()-T0:7.1f}s] {s}", flush=True)


from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu import Context, VVIntegrator
from openmm_velocityverlet_tpu.ops import constraints as cons_mod
from openmm_velocityverlet_tpu.ops import ewald

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d + "conf.gro")
psf = OplsPsfFile(d + "topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d + "ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                         rigidWater=True)
integ = VVIntegrator(333, 10, 1, 40, 0.001)
integ.setMaxDrudeDistance(0.02)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
carry = ctx._make_carry()
jax.block_until_ready(carry)
mark("setup")
s = built.system
ev = ctx.evaluator
st = carry.state
pos, box, vel = st.pos, st.box, st.vel
single = ctx._build_step_fn()


def timeit(name, jfn, *args, scale=1.0):
    try:
        t0 = time.time()
        out = jfn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        mark(f"{name:34s} FAILED: {type(e).__name__} {str(e)[:90]}")
        return
    tc = time.time() - t0
    try:
        t0 = time.time()
        out = jfn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        mark(f"{name:34s} FAILED2: {type(e).__name__} {str(e)[:90]}")
        return
    dt = (time.time() - t0) / scale
    mark(f"{name:34s} {dt*1e3:9.2f} ms/unit (first {tc:.1f}s)")


# A. scan static 50 steps, donated
@jax.jit
def scan50(carry):
    c, _ = jax.lax.scan(lambda c, _: (single(c), None), carry, None, length=50)
    return c


# C. stripped core loop (force+kick+drift only), scan 50
inv_m = np.asarray(s.inv_masses)
dt_ = ctx.data.dt


def core(cr):
    stt = cr.state
    _, F = ev.energy_forces(stt.pos, stt.box)
    velc = stt.vel + dt_ * inv_m[:, None] * F
    posc = stt.pos + dt_ * velc
    return cr.replace(state=stt.replace(pos=posc, vel=velc))


@jax.jit
def scan50_core(carry):
    c, _ = jax.lax.scan(lambda c, _: (core(c), None), carry, None, length=50)
    return c


timeit("scan50 core-only", scan50_core, carry, scale=50)

# D. fixed-iteration constraints (fori, no while cond)
def pos_cons_fixed(p, pn, iters):
    i, j = ctx.cons.pairs[:, 0], ctx.cons.pairs[:, 1]
    ref = p[i] - p[j]
    d2 = ctx.cons.dist * ctx.cons.dist

    def body(k, x):
        delta = x[i] - x[j]
        r2 = jnp.sum(delta * delta, -1)
        diff = r2 - d2
        denom = 2.0 * ctx.cons.inv_mass_sum * jnp.sum(delta * ref, -1)
        g = diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        cid = np.maximum(ctx.cons.atom_cons, 0)
        valid = (ctx.cons.atom_cons >= 0).astype(x.dtype)
        contrib = (g[cid] * valid * ctx.cons.atom_sign)[..., None] * ref[cid]
        return x - inv_m[:, None] * jnp.sum(contrib, axis=1)

    return jax.lax.fori_loop(0, iters, body, pn)


for it in (6, 10):
    timeit(f"pos_cons fixed {it}", jax.jit(partial(pos_cons_fixed, iters=it)),
           pos, pos + 0.001 * vel)

# E. ewald recip chunk sweep
for ch in (2048, 4096, 16384):
    timeit(f"recip+grad chunk {ch}", jax.jit(
        lambda p, ch=ch: jax.value_and_grad(
            lambda pp: ewald.reciprocal_energy(
                pp, box, jnp.asarray(s.charges), s.ewald_beta, s.kmax,
                chunk=ch))(p)), pos)
mark("done")
