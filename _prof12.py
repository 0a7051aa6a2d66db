"""Isolate term-pass costs: incidence gather vs scatter-add vs vmap-only."""
import time
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
from openmm_velocityverlet_tpu.ops import term_forces

d = "/root/reference/examples/models/bulk_Im21/"
gro = GroFile(d + "conf.gro")
psf = OplsPsfFile(d + "topol.psf", periodicBoxVectors=gro.getPeriodicBoxVectors())
prm = CharmmParameterSet(d + "ff.prm")
built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                         rigidWater=True)
s = built.system
integ = VVIntegrator(333, 10, 1, 40, 0.001)
ctx = Context(built.system, integ, positions=gro.positions, box=gro.box)
ctx.set_velocities_to_temperature(333.0)
carry = ctx._make_carry()
jax.block_until_ready(carry)
mark("setup")
tt, ti, tn = ctx.evaluator.term_tables

# slot -> atom map for scatter variant
slot_atom = np.full(tn, 9250, np.int32)  # out-of-range = dropped
off = 0
for name, idx, prm_, split in tt:
    nt, p = idx.shape
    for sl in range(p):
        slot_atom[off + sl::0 + p][:0] = 0  # noop to keep flake quiet
    flatidx = idx.reshape(-1)
    slot_atom[off:off + nt * p] = np.where(flatidx >= 0, flatidx, 9250)
    off += nt * p


def vmap_stages(pos, box):
    contribs = []
    for name, idx, prm_, split in tt:
        pts = pos[np.maximum(idx, 0)]
        fn, _ = term_forces._TERM_FNS[name]
        if name == "exception":
            (e_t, aux), g_t = jax.vmap(jax.value_and_grad(fn, has_aux=True),
                                       in_axes=(0, 0, None))(
                pts, jnp.asarray(prm_), box)
        else:
            e_t, g_t = jax.vmap(jax.value_and_grad(fn),
                                in_axes=(0, 0, None))(pts, jnp.asarray(prm_),
                                                      box)
        mask = (idx[:, 0] >= 0)
        g_t = jnp.where(mask[:, None, None], g_t, 0.0)
        contribs.append(g_t.reshape(-1, 3))
    return jnp.concatenate(contribs, axis=0)


dt_ = 0.001
inv_m = np.asarray(s.inv_masses)


def loop(fn):
    @jax.jit
    def run(carry):
        def body(c, _):
            st = c.state
            F = fn(st.pos, st.box)
            vel = st.vel + dt_ * inv_m[:, None] * F
            pos = st.pos + dt_ * vel
            return c.replace(state=st.replace(pos=pos, vel=vel)), None
        c, _ = jax.lax.scan(body, carry, None, length=50)
        return c
    return run


def timeit(name, f):
    jf = loop(f)
    jax.block_until_ready(jf(carry))
    t0 = time.time()
    jax.block_until_ready(jf(carry))
    mark(f"{name:30s} {(time.time()-t0)/50*1e3:8.2f} ms/step")


def f_current(pos, box):
    _, f = term_forces.energies_and_forces(pos, box, tt, ti, tn)
    return f


def f_scatter(pos, box):
    flat = vmap_stages(pos, box)
    return -(jnp.zeros((9251, 3), jnp.float32).at[slot_atom].add(flat)[:9250])


def f_vmap_only(pos, box):
    flat = vmap_stages(pos, box)
    # fake cheap reduction so nothing is dead-code eliminated
    return jnp.broadcast_to(jnp.sum(flat, axis=0), (9250, 3)) * 1e-9


timeit("terms current (gather K=56)", f_current)
timeit("terms scatter-add", f_scatter)
timeit("terms vmap-only", f_vmap_only)
mark("done")
