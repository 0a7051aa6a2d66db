"""Context: binds System + VVIntegrator + ForceEvaluator into one fused,
jitted MD step and owns the dynamic state.

This is the analog of OpenMM's Context plus the reference's step orchestration
(VVIntegrator::stepMiddle / stepVV, VVIntegrator.cpp:232-338) — but the whole
``step(n)`` is a single device program (jit + lax.fori_loop): force evaluation,
extra forces, kicks/drifts, constraints, TGNH chain, hard wall, image sync and
the barostat all fuse with zero host synchronization per step.

TPU-tunnel-aware design notes (measured on the axon transport):
* host->device transfers cost ~100 ms each regardless of size, so every
  static table stays host numpy and embeds as a compile-time constant;
* TPU gathers with *constant* indices compile to a fast pre-scheduled form
  (~15x faster than dynamic-index gathers), which the constant embedding
  also buys us;
* the nonbonded hot loop is the z-banded sorted Pallas pair sweep
  (ops/pallas_pair.py) with a semi-static sort cache refreshed every
  sort_refresh steps; a per-step coverage check replaces neighbor-list
  overflow handling (ops/allpairs.py is the jnp fallback for CPU tests).
"""
from __future__ import annotations

import typing
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .forces import ForceEvaluator
from .integrators import barostat as baro_mod
from .integrators import stepping
from .integrators.vv import IntegratorData, VVIntegrator
from .ops import constraints as cons_mod
from .system import State, System, make_state
from .units import BOLTZ

f32 = jnp.float32
i32 = jnp.int32


def enable_compilation_cache():
    """Enable the persistent XLA compilation cache (idempotent).

    The fused MD step is a single large program (~8 min cold compile for a
    20k-atom system through a remote TPU); caching makes every rerun of an
    unchanged binary start in seconds.  Called automatically at Context
    construction — NOT at import, so merely importing the package never
    mutates global JAX config for library consumers.  Opt out with
    JAX_COMPILATION_CACHE_DIR="" in the environment, or opt in earlier by
    calling this before your own jax.config setup.
    """
    import os
    if ("JAX_COMPILATION_CACHE_DIR" not in os.environ
            and jax.config.jax_compilation_cache_dir is None):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/ommvv_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@struct.dataclass
class Carry:
    state: State
    baro: baro_mod.BarostatState
    forces: jnp.ndarray        # (N,3) cached FF forces (VV scheme carry)
    forces_extra: jnp.ndarray  # (N,3) cached extra forces (VV scheme carry)
    forces_valid: jnp.ndarray  # () bool
    # last step's pair-coverage flag: True means that step ran the exact
    # full-sweep fallback; the next chunk's entry cond rebuilds the cache
    # (one coverage check per step total — computed inside the pair sweep,
    # consumed at the chunk boundary).  The spatial-sort cache itself is
    # NOT carried: it is a loop-invariant argument of step_n, rebuilt by
    # the host every sort_refresh steps (async dispatch, no syncs) —
    # carrying it through a per-step cond cost ~90 us/step in XLA
    # conditional operand copies.
    cov_bad: typing.Any = None


class Context:
    def __init__(self, system: System, integrator: VVIntegrator,
                 external_forces: Sequence = (),
                 barostat: Optional[baro_mod.BarostatConfig] = None,
                 positions=None, box=None, row_block: int = 1024,
                 ewald_chunk: int = 4096, sort_refresh: int = 120,
                 pair_ts: int = 0, fold_exc14: bool = False,
                 recip: str = "auto", mesh=None, mesh_axis: str = "atoms",
                 pallas_interpret: bool = False,
                 strict_pairs: bool = False, **_legacy):
        # mesh: optional jax.sharding.Mesh — shards the step over the atom
        # axis (big per-atom carry arrays sharded, NH chains/scalars
        # replicated, pair-sweep row tiles per device with the column
        # reaction psum'd over ICI).  The public multi-chip path: every
        # Context API (step, reporters, checkpoints) works unchanged.
        enable_compilation_cache()
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.n_real = system.n_atoms
        if mesh is not None:
            n_dev = int(np.asarray(mesh.devices).size)
            n_pad = ((system.n_atoms + n_dev - 1) // n_dev) * n_dev
            if n_pad != system.n_atoms:
                # sharding requires the atom axis divisible by the mesh
                # size; pad with inert ghosts and hide them from the
                # public position/velocity surface (self.n_real)
                from .system import pad_system
                system = pad_system(system, n_pad)
                if positions is not None:
                    positions = np.concatenate(
                        [np.asarray(positions, np.float32),
                         np.zeros((n_pad - self.n_real, 3), np.float32)])
        # sort_refresh: steps between spatial-sort cache rebuilds for the
        # tiled pair sweeps.  Staleness is SAFE at any interval — the
        # per-step coverage check runs against current positions and a trip
        # costs one exact full-sweep step plus an immediate rebuild — so
        # this only trades amortized rebuild cost (~13 ms at 19.5k atoms)
        # against the rare fallback step; at 333 K / 1 fs the 0.1 nm
        # candidate skin stays covered for >240 steps
        self.sort_refresh = int(sort_refresh)
        self.system = system
        self.integrator = integrator
        self.data: IntegratorData = integrator.build_data(system)
        self.barostat_cfg = barostat
        if box is None:
            raise ValueError("box is required")
        box = np.asarray(box, np.float32)
        # constant-voltage image layout: when the image block is one
        # contiguous trailing mirror of one contiguous parent block (the
        # standard run-edl wiring), the exact-k reciprocal derives the
        # image structure factor from the parents' by a static transform
        # (ewald.reciprocal_energy mirror doc) — no image atom pass
        image_mirror = None
        ip = np.asarray(self.data.image_pairs)
        if ip.shape[0] and mesh is None:
            k = ip.shape[0]
            img0, par0 = int(ip[0, 0]), int(ip[0, 1])
            if (img0 + k == system.n_atoms
                    and np.array_equal(ip[:, 0], np.arange(img0, img0 + k))
                    and np.array_equal(ip[:, 1], np.arange(par0, par0 + k))
                    and par0 + k <= img0):
                image_mirror = (img0, par0, k,
                                float(self.data.mirror_location))
        self.evaluator = ForceEvaluator(
            system, external_forces, ewald_chunk=ewald_chunk,
            row_block=row_block, pair_ts=pair_ts, fold_exc14=fold_exc14,
            recip=recip, box_hint=box, pos_hint=positions,
            mesh=mesh, mesh_axis=mesh_axis, pallas_interpret=pallas_interpret,
            strict_pairs=strict_pairs, image_mirror=image_mirror)

        n = system.n_atoms
        self.cons = cons_mod.build_constraint_data(
            np.asarray(system.constraints), np.asarray(system.constraint_dist),
            np.asarray(system.inv_masses),
            tolerance=integrator.constraint_tolerance)

        self.state: State = make_state(
            np.zeros((n, 3), np.float32) if positions is None else positions,
            box, num_nh_chains=integrator.num_nh_chains,
            seed=integrator.random_number_seed)
        self._carry: Optional[Carry] = None
        self._compiled = {}
        self._chunk_scalars = {}
        self._rebuilds = 0
        self._overflow_checked = 0
        if positions is not None:
            self.set_positions(positions)
        if getattr(integrator, "debug_enabled", False):
            self._print_config()

    def _print_config(self):
        """Init-time configuration dump (the reference prints this per
        kernel at initialize(), e.g. CudaVVKernels.cpp:656-666)."""
        import sys
        d = self.data
        s = self.system
        print(f"[vv-tpu] atoms={s.n_atoms} molecules={s.n_molecules} "
              f"drude_pairs={s.drude_pairs.shape[0]} "
              f"constraints={s.constraints.shape[0]} "
              f"vsites={s.vsite_index.shape[0]}", file=sys.stderr)
        print(f"[vv-tpu] scheme={'middle' if d.use_middle else 'vv'} "
              f"dt={d.dt} T={d.temperature} freq={d.frequency} "
              f"T_drude={d.drude_temperature} freq_drude={d.drude_frequency} "
              f"chains={d.num_nh_chains} loops={d.loops_per_step} "
              f"temp_groups={d.num_temp_groups} "
              f"com_group={d.use_com_temp_group}", file=sys.stderr)
        print(f"[vv-tpu] NH: normal={d.nh_normal.shape[0]} "
              f"pairs={d.nh_pairs.shape[0]} DOF={list(d.temp_group_dof)}; "
              f"LD: normal={d.ld_normal.shape[0]} "
              f"pairs={d.ld_pairs.shape[0]} "
              f"friction={d.friction}/{d.drude_friction}", file=sys.stderr)
        print(f"[vv-tpu] images={d.image_pairs.shape[0]} "
              f"mirror={d.mirror_location} "
              f"efield={d.electric_field} "
              f"electrolytes={d.electrolyte.shape[0]} "
              f"cos={d.cos_acceleration} "
              f"hardwall={d.max_drude_distance} "
              f"ewald_beta={s.ewald_beta:.4f} kmax={s.kmax} "
              f"pair_kernel={self.evaluator.pair_kernel}", file=sys.stderr)

    # ------------------------------------------------------------- helpers
    def _make_carry(self):
        st = self.state
        vol = float(st.box[0] * st.box[1] * st.box[2])
        baro = baro_mod.make_barostat_state(vol)
        n = self.system.n_atoms
        # the middle scheme never reads the cached-forces carry (it
        # recomputes forces at the top of every step); zero-size arrays
        # keep two dead (N,3) buffers out of the step while-loop carry
        nf = 0 if self.data.use_middle else n
        carry = Carry(state=st, baro=baro,
                      forces=jnp.zeros((nf, 3), f32),
                      forces_extra=jnp.zeros((nf, 3), f32),
                      forces_valid=jnp.zeros((), bool),
                      cov_bad=jnp.zeros((), bool))
        if self.mesh is not None:
            from .parallel.mesh import shard_carry
            carry = shard_carry(carry, self.mesh, self.mesh_axis,
                                n_atoms=n)
        return carry

    # --------------------------------------------------------- public API
    def _pad_atoms(self, arr):
        """Extend an (n_real, ...) user array over the mesh-padding ghosts."""
        arr = jnp.asarray(arr, f32)
        extra = self.system.n_atoms - arr.shape[0]
        if extra > 0:
            arr = jnp.concatenate(
                [arr, jnp.zeros((extra,) + arr.shape[1:], f32)])
        return arr

    def set_positions(self, positions):
        pos = self._pad_atoms(positions)
        pos = self.evaluator.place_vsites(pos)
        self.state = self.state.replace(pos=pos, pos_err=jnp.zeros_like(pos))
        self._carry = None

    def set_velocities(self, velocities):
        self.state = self.state.replace(vel=self._pad_atoms(velocities))
        if self._carry is not None:
            self._carry = self._carry.replace(
                state=self.state, forces_valid=jnp.zeros((), bool))

    def set_velocities_to_temperature(self, temperature, seed=12345):
        key = jax.random.PRNGKey(seed)
        sigma = np.sqrt(
            BOLTZ * temperature * np.asarray(self.system.inv_masses,
                                             np.float32))[:, None]
        vel = sigma * jax.random.normal(key, (self.system.n_atoms, 3), f32)
        self.set_velocities(vel)

    def get_positions(self):
        """Positions with virtual sites re-placed in their parent frames
        (OpenMM computeVirtualSites semantics: the step only integrates
        massive particles; sites are a function of their parents).
        Mesh-padding ghosts are excluded."""
        if self.system.vsite_index.shape[0] == 0:
            return np.asarray(self.state.pos)[:self.n_real]
        fn = self._get_compiled("place_vsites")
        return np.asarray(fn(self.state.pos))[:self.n_real]

    def get_velocities(self):
        return np.asarray(self.state.vel)[:self.n_real]

    def get_box(self):
        return np.asarray(self.state.box)

    @property
    def time(self):
        return float(self.state.time)

    @property
    def current_step(self):
        return int(self.state.step)

    def kinetic_energy(self):
        return float(stepping.kinetic_energy(self.state.vel,
                                             jnp.asarray(self.system.masses)))

    def potential_energy_terms(self):
        fn = self._get_compiled("energy")
        terms = fn(self.state)
        return {k: float(v) for k, v in terms.items()}

    def potential_energy(self):
        return sum(self.potential_energy_terms().values())

    def group_energies(self):
        return {g: float(v) for g, v in self.evaluator.group_energies(
            self.potential_energy_terms()).items()}

    def get_forces(self):
        fn = self._get_compiled("forces")
        return np.asarray(fn(self.state))

    def get_viscosity(self):
        """(vMax nm/ps, 1/viscosity in 1/(Pa s)) — VVIntegrator::getViscosity
        (VVIntegrator.cpp:378-383) with the SWIG unit conversion applied."""
        v = float(self.state.cos_v)
        inv_vis_md = float(stepping.inverse_viscosity(
            jnp.asarray(v), self.state.box, jnp.asarray(self.system.masses),
            self.data.cos_acceleration)) if self.data.cos_acceleration else 0.0
        return v, inv_vis_md * 6.02214076e5

    def step(self, n: int):
        """Advance n steps (async device dispatches, no host round-trips).

        The spatial-sort pair cache lives entirely inside the device
        program: step_n rebuilds it at every sort_refresh segment start
        (and at entry).  Within a segment, a coverage trip runs the exact
        fallback sweep (correct, slower), exits the segment early, and the
        next segment start rebuilds device-side."""
        if self._carry is None:
            self._carry = self._make_carry()
        ev = self.evaluator
        fn = self._get_compiled("step_n")
        n = int(n)
        # cache the device scalar: a fresh host scalar costs an upload
        if n not in self._chunk_scalars:
            self._chunk_scalars[n] = jnp.asarray(n, i32)
        self._carry, over = fn(self._carry, self._chunk_scalars[n])
        if ev.uses_band:
            self._rebuilds += 1 + (n - 1) // self.sort_refresh
            if self._rebuilds - self._overflow_checked >= 8:
                # safety valve (syncs, hence the 8-rebuild cadence —
                # frequent enough that sustained overflow costs at most
                # ~8*sort_refresh exact-fallback steps before the
                # capacity grows): sustained density growth overflowed
                # the candidate list and every step is falling back to
                # the exact full sweep — grow the capacity and recompile.
                self._overflow_checked = self._rebuilds
                if bool(over):
                    import sys
                    old_cap = ev.plist_cap
                    ev.plist_cap = int(ev.plist_cap * 1.5) + 64
                    print(f"[vv-tpu] pair-list overflow safety valve: "
                          f"plist_cap {old_cap} -> {ev.plist_cap}; "
                          f"recompiling the step (expect a one-off "
                          f"compile pause and a step-timing change)",
                          file=sys.stderr)
                    self._compiled.clear()
        self.state = self._carry.state

    # ------------------------------------------------------ compiled fns
    def _get_compiled(self, name):
        if name in self._compiled:
            return self._compiled[name]
        if name == "place_vsites":
            fn = jax.jit(self.evaluator.place_vsites)
        elif name == "energy":
            def energy(state):
                terms, _ = self.evaluator.energy_forces(state.pos, state.box)
                return terms
            fn = jax.jit(energy)
        elif name == "forces":
            def forces(state):
                _, f = self.evaluator.energy_forces(state.pos, state.box)
                return f
            fn = jax.jit(forces)
        elif name == "pair_cache":
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                repl = NamedSharding(self.mesh, PartitionSpec())
                fn = jax.jit(self.evaluator.make_pair_cache,
                             out_shardings=repl)
            else:
                fn = jax.jit(self.evaluator.make_pair_cache)
        elif name == "step_n":
            single = self._build_step_fn()
            ev = self.evaluator
            uses_band = ev.uses_band
            refresh = self.sort_refresh

            def step_n(carry, n):
                """One device program for n steps: an outer loop over
                cache segments rebuilds the spatial-sort cache at every
                segment start; the inner loop treats the cache as
                loop-invariant and ends a segment either at sort_refresh
                steps or EARLY, right after a step whose coverage check
                tripped (that step already ran the exact fallback sweep,
                so a trip costs one slow step plus a rebuild — never a
                tail of fallback steps).  Doing the segmenting on-device
                keeps ctx.step(n) a single dispatch (the tunnel charges
                ~20-30 ms per host call).

                The cache is deliberately a LOOP-LOCAL of the outer body,
                never a while-loop carry: carrying the PairCache (whose
                packed pair list is a Mosaic scalar-prefetch operand)
                through lax.while_loop faults the TPU at EDL scale
                (~40k atoms / XLA while-loop buffer aliasing vs SMEM
                prefetch; bisected in tools/debug_edl_stage2.py — the
                identical program with the cache as a loop-local runs
                clean).  The price is one unconditional rebuild at entry
                (~13 ms at 19.5k atoms) per host step() call instead of
                reusing the previous call's cache.  Returns
                (carry, overflow_seen) — the host's safety valve polls
                the flag instead of reading a returned cache."""
                if not uses_band:
                    return (jax.lax.fori_loop(
                        0, n, lambda i, c: single(c, None), carry),
                        jnp.zeros((), bool))

                def outer_cond(s):
                    return s[1] < n

                def outer_body(s):
                    carry, done, over = s
                    cache = ev.make_pair_cache(carry.state.pos,
                                               carry.state.box)
                    if cache.overflow is not None:
                        over = over | cache.overflow
                    carry = carry.replace(cov_bad=jnp.zeros((), bool))
                    lim = jnp.minimum(done + refresh, n)

                    def inner_cond(t):
                        return (t[1] < lim) & ~t[0].cov_bad

                    def inner_body(t):
                        return single(t[0], cache), t[1] + 1

                    carry, done = jax.lax.while_loop(
                        inner_cond, inner_body, (carry, done))
                    return (carry, done, over)

                carry, _, over = jax.lax.while_loop(
                    outer_cond, outer_body,
                    (carry, jnp.zeros((), i32), jnp.zeros((), bool)))
                return carry, over
            if self.mesh is not None:
                # explicit shardings: atom-axis arrays of the carry
                # sharded, scalars replicated; XLA propagates the
                # layout through the fused step and inserts the psum /
                # all-gather collectives over ICI
                from jax.sharding import NamedSharding, PartitionSpec
                from .parallel.mesh import carry_shardings
                repl = NamedSharding(self.mesh, PartitionSpec())
                cs = carry_shardings(self._make_carry(), self.mesh,
                                     self.mesh_axis,
                                     n_atoms=self.system.n_atoms)
                fn = jax.jit(step_n, in_shardings=(cs, repl),
                             out_shardings=(cs, repl))
            else:
                fn = jax.jit(step_n)
        else:
            raise KeyError(name)
        self._compiled[name] = fn
        return fn

    # ------------------------------------------------------- the MD step
    def _build_step_fn(self):
        sysm = self.system
        data = self.data
        ev = self.evaluator
        cons = self.cons
        dt = data.dt
        masses = np.asarray(sysm.masses)
        inv_m = np.asarray(sysm.inv_masses)
        has_nh = (data.nh_normal.shape[0] + data.nh_pairs.shape[0]) > 0
        has_ld = (data.ld_normal.shape[0] + data.ld_pairs.shape[0]) > 0
        has_ef = data.electrolyte.shape[0] > 0 and data.electric_field != 0
        has_cos = data.cos_acceleration != 0
        has_extra = has_ld or has_ef or has_cos
        has_cons = cons.n_constraints > 0
        baro_cfg = self.barostat_cfg
        # COM-inert tail (EDL image atoms: massless, outside every NH temp
        # group, mol ids reused from their mirrored molecules) — lets the
        # gather-free runs path cover the real-molecule prefix
        mol_runs = stepping.mol_runs_from_id(
            sysm.particle_mol_id,
            tail_inert=(masses == 0.0) & ~np.asarray(data.nh_mask))

        def extra_forces(pos, vel, box, key, ld_as_force=True):
            f = jnp.zeros_like(pos)
            if has_ld and ld_as_force:
                f = f + stepping.langevin_extra_force(vel, masses, key, data)
            if has_ef:
                fz = stepping.efield_extra_force(sysm.charges, data)
                f = f + fz[:, None] * np.asarray([0.0, 0.0, 1.0],
                                                 np.float32)
            if has_cos:
                fx = stepping.cos_extra_force(pos, masses, box, data)
                f = f + fx[:, None] * np.asarray([1.0, 0.0, 0.0], np.float32)
            return f

        def thermostat(pos, vel, box, st: State):
            """NH/TGNH block incl. cosine bias remove/restore
            (VVIntegrator.cpp:251-260)."""
            cos_v = st.cos_v
            if has_cos:
                cos_v = stepping.cos_velocity_bias(pos, vel, masses, box)
                vel = stepping.cos_shift_velocity(pos, vel, box, cos_v, -1.0)
            vel, eta, eta_dot, eta_dotdot, _ = stepping.nh_scale_velocities(
                vel, masses, inv_m, sysm.particle_mol_id, sysm.mol_masses,
                sysm.mol_inv_masses, data, st.nh_eta, st.nh_eta_dot,
                st.nh_eta_dotdot, mol_table=sysm.mol_table,
                mol_runs=mol_runs)
            if has_cos:
                vel = stepping.cos_shift_velocity(pos, vel, box, cos_v, 1.0)
            st = st.replace(nh_eta=eta, nh_eta_dot=eta_dot,
                            nh_eta_dotdot=eta_dotdot, cos_v=cos_v)
            return vel, st

        def update_context_state(carry: Carry):
            """CMMotionRemover + MC barostat (context->updateContextState,
            VVIntegrator.cpp:234)."""
            st = carry.state
            if sysm.has_cm_motion_remover:
                mom = jnp.sum(masses[:, None] * st.vel, 0)
                vcm = mom / np.sum(masses)
                vel = jnp.where(inv_m[:, None] > 0, st.vel - vcm, st.vel)
                st = st.replace(vel=vel)
            invalidated = jnp.zeros((), bool)
            if baro_cfg is not None:
                def try_move(args):
                    st, bst = args

                    def efn(pos, box):
                        terms, _ = ev.energy_forces(pos, box)
                        return sum(terms.values())

                    acc, pos, box, bst = baro_mod.attempt_move(
                        baro_cfg, bst, st.pos, st.box, sysm.particle_mol_id,
                        sysm.mol_masses, sysm.mol_inv_masses, masses, efn,
                        mol_table=sysm.mol_table)
                    st = st.replace(pos=pos, box=box,
                                    pos_err=jnp.where(acc, 0.0, st.pos_err))
                    return st, bst, acc

                def no_move(args):
                    st, bst = args
                    return st, bst, jnp.zeros((), bool)

                st, bst, acc = jax.lax.cond(
                    st.step % baro_cfg.frequency == 0, try_move, no_move,
                    (st, carry.baro))
                carry = carry.replace(baro=bst)
                invalidated = acc
            return carry.replace(state=st), invalidated

        # ------------------------------ middle scheme (stepMiddle) --------
        def step_middle(carry: Carry, cache=None) -> Carry:
            carry, _ = update_context_state(carry)
            st = carry.state
            pos, err, vel, box = st.pos, st.pos_err, st.vel, st.box

            _, F, cov = ev.energy_forces(pos, box, want_energy=False,
                                         pair_cache=cache, return_cov=True)
            carry = carry.replace(cov_bad=cov)
            key, k_l = jax.random.split(st.rng_key)
            if has_extra:
                # Langevin is applied as an exact OU velocity map in the
                # thermostat slot below (stable for stiff Drude springs at
                # omega*dt ~ 1, like the spring-in-force middle scheme
                # itself), not as an explicit drag force.
                F = F + extra_forces(pos, vel, box, k_l, ld_as_force=False)
            # full kick (integrateMiddleVel)
            vel = vel + dt * inv_m[:, None] * F
            if has_cons:
                vel = cons_mod.apply_velocity_constraints(pos, vel, box, cons,
                                                          inv_m)
            half1 = 0.5 * dt * vel
            if has_nh:
                vel, st = thermostat(pos, vel, box, st)
            if has_ld:
                vel = stepping.langevin_ou_update(vel, masses, k_l, data)
                if has_cons:
                    vel = cons_mod.apply_velocity_constraints(
                        pos, vel, box, cons, inv_m)
            delta = half1 + 0.5 * dt * vel
            new_pos, new_err = stepping.compensated_add(pos, err, delta)
            if has_cons:
                con_pos = cons_mod.apply_position_constraints(
                    pos, new_pos, box, cons, inv_m)
                # constraint velocity correction (integrateMiddlePos3)
                vel = vel + (con_pos - new_pos) / dt
                new_pos, new_err = stepping.compensated_add(
                    new_pos, new_err, con_pos - new_pos)
            hw_pos, vel = stepping.apply_hardwall(new_pos, vel, masses, inv_m,
                                                  box, data)
            new_pos, new_err = stepping.compensated_add(new_pos, new_err,
                                                        hw_pos - new_pos)
            img_pos = stepping.update_image_positions(new_pos, data)
            if data.image_pairs.shape[0]:
                new_err = jnp.where((img_pos != new_pos).any(-1, keepdims=True),
                                    0.0, new_err)
                new_pos = img_pos
            st = st.replace(pos=new_pos, pos_err=new_err, vel=vel,
                            rng_key=key, step=st.step + 1, time=st.time + dt)
            return carry.replace(state=st)

        # --------------------------- vanilla VV scheme (stepVV) -----------
        def step_vv(carry: Carry, cache=None) -> Carry:
            carry, invalidated = update_context_state(carry)
            st = carry.state
            pos, err, vel, box = st.pos, st.pos_err, st.vel, st.box

            def recompute(_):
                _, f = ev.energy_forces(pos, box, want_energy=False,
                                        pair_cache=cache)
                return f

            F = jax.lax.cond(carry.forces_valid & ~invalidated,
                             lambda _: carry.forces, recompute, None)
            Fx = carry.forces_extra
            # first NH scaling
            if has_nh:
                vel, st = thermostat(pos, vel, box, st)
            # half kick + drift (velocityVerletIntegrateVelocities/Positions)
            vel = vel + 0.5 * dt * inv_m[:, None] * (F + Fx)
            delta = dt * vel
            new_pos, new_err = stepping.compensated_add(pos, err, delta)
            if has_cons:
                con_pos = cons_mod.apply_position_constraints(
                    pos, new_pos, box, cons, inv_m)
                new_pos, new_err = stepping.compensated_add(
                    new_pos, new_err, con_pos - new_pos)
                # velocityVerletIntegratePositions sets vel = delta/dt after
                # constraints (velocityVerlet.cu:35-68)
                vel = jnp.where(inv_m[:, None] > 0, (con_pos - pos) / dt, vel)
            hw_pos, vel = stepping.apply_hardwall(new_pos, vel, masses, inv_m,
                                                  box, data)
            new_pos, new_err = stepping.compensated_add(new_pos, new_err,
                                                        hw_pos - new_pos)
            img_pos = stepping.update_image_positions(new_pos, data)
            if data.image_pairs.shape[0]:
                new_err = jnp.where((img_pos != new_pos).any(-1, keepdims=True),
                                    0.0, new_err)
                new_pos = img_pos
            # forces at full-step positions
            _, F2, cov = ev.energy_forces(new_pos, box, want_energy=False,
                                          pair_cache=cache, return_cov=True)
            carry = carry.replace(cov_bad=cov)
            key, k_l = jax.random.split(st.rng_key)
            Fx2 = (extra_forces(new_pos, vel, box, k_l) if has_extra
                   else jnp.zeros_like(F2))
            vel = vel + 0.5 * dt * inv_m[:, None] * (F2 + Fx2)
            if has_cons:
                vel = cons_mod.apply_velocity_constraints(new_pos, vel, box,
                                                          cons, inv_m)
            st = st.replace(pos=new_pos, pos_err=new_err, vel=vel, rng_key=key)
            if has_nh:
                vel, st = thermostat(new_pos, st.vel, box, st)
                st = st.replace(vel=vel)
            st = st.replace(step=st.step + 1, time=st.time + dt)
            return carry.replace(state=st, forces=F2, forces_extra=Fx2,
                                 forces_valid=jnp.ones((), bool))

        return step_middle if data.use_middle else step_vv
