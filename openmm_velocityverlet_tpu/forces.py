"""Total potential-energy / force evaluation.

Composes every term the reference workloads exercise (SURVEY.md section 3.5):
bonded + OPLS tabulated LJ + Ewald Coulomb (direct, reciprocal, exclusion
corrections, self, dispersion LRC) + 1-4 exceptions + Drude springs + Thole
screening + CLPol Tang-Toennies damping + user external forces.

Split for TPU efficiency:
* hot (N,K) neighbor terms and the per-atom (N,E)/(N,X) tables produce
  analytic forces (gather + sum, no scatter);
* the remaining small terms are energies differentiated with jax.grad;
* virtual-site placement wraps the whole thing, so lone-pair forces
  redistribute onto parents through one vjp (ops/vsites.py).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops import (allpairs, bonded, cmap, drude, ewald, ewald_pallas, gb,
                  mol_terms, nonbonded, pallas_pair, pme, term_forces, vsites)
from .system import System


def _drop_constraint_null_terms(system):
    """System copy with constraint-null spring terms removed, or None if
    there are none.

    A bond/Urey-Bradley spring on a constrained pair, or an angle spring
    whose three internal distances are all constrained (rigid water), acts
    only along directions the constraint solver projects away: SHAKE holds
    the coordinate fixed and RATTLE removes the along-constraint velocity
    component after every kick, so dropping the term from the FORCE path is
    exactly equivalent dynamics.  These terms exist because the reference
    defaults to flexibleConstraints=True (oplspsffile.py:1000-1008), which
    is about reported energies, not dynamics — energy queries keep them."""
    cons = np.asarray(system.constraints)
    if cons.shape[0] == 0:
        return None
    cset = {(int(min(i, j)), int(max(i, j))) for i, j in cons.tolist()}

    def pair_null(tbl):
        t = np.asarray(tbl).reshape(-1, 2)
        return np.array([(min(i, j), max(i, j)) in cset
                         for i, j in t.tolist()], bool)

    null_b = pair_null(system.bonds) if system.bonds.shape[0] else \
        np.zeros(0, bool)
    null_u = pair_null(system.ub_bonds) if system.ub_bonds.shape[0] else \
        np.zeros(0, bool)
    ang = np.asarray(system.angles).reshape(-1, 3)
    null_a = np.array(
        [((min(i, j), max(i, j)) in cset and (min(j, k), max(j, k)) in cset
          and (min(i, k), max(i, k)) in cset) for i, j, k in ang.tolist()],
        bool) if ang.shape[0] else np.zeros(0, bool)
    if not (null_b.any() or null_u.any() or null_a.any()):
        return None
    kb, ku, ka = ~null_b, ~null_u, ~null_a
    return system.replace(
        bonds=np.asarray(system.bonds).reshape(-1, 2)[kb],
        bond_r0=np.asarray(system.bond_r0)[kb],
        bond_k=np.asarray(system.bond_k)[kb],
        ub_bonds=np.asarray(system.ub_bonds).reshape(-1, 2)[ku],
        ub_r0=np.asarray(system.ub_r0)[ku],
        ub_k=np.asarray(system.ub_k)[ku],
        angles=ang[ka],
        angle_theta0=np.asarray(system.angle_theta0)[ka],
        angle_k=np.asarray(system.angle_k)[ka])


class ForceEvaluator:
    """Builds a pure ``(pos, box) -> (terms, forces)`` function for a System
    plus optional external energy closures.

    The System's tables are host numpy; they embed as compile-time constants
    when the step is traced, which selects XLA's fast constant-index gather
    lowering on TPU (measured 15x faster than dynamic-index gathers).
    """

    def __init__(self, system: System,
                 external_forces: Sequence[Callable] = (),
                 ewald_chunk: int = 16384, row_block: int = 1024,
                 pair_kernel: str = "auto",
                 box_hint=None, pos_hint=None, pair_ts: int = 0,
                 fold_exc14: bool = False, recip: str = "auto",
                 mesh=None, mesh_axis: str = "atoms",
                 pallas_interpret: bool = False,
                 strict_pairs: bool = False, image_mirror=None, **_legacy):
        self.system = system
        self.external_forces = list(external_forces)
        self.ewald_chunk = ewald_chunk
        self.row_block = row_block
        # (img0, par0, count, mirror_z) when the constant-voltage image
        # block is a contiguous trailing mirror of a contiguous parent
        # block: the exact-k reciprocal then derives the image structure
        # factor from the parents' by a static transform instead of an
        # atom pass (ewald.reciprocal_energy mirror doc) — halves the
        # reciprocal's atom work at EDL
        self.image_mirror = image_mirror
        # strict_pairs=True restores the in-step exact full-sweep fallback
        # (a lax.cond) when the pair-list coverage check trips; the default
        # accepts the standard Verlet-buffer semantics — the flagged step
        # may miss a pair just entering the cutoff (force ~1e-3 kJ/mol/nm)
        # and the cache still rebuilds immediately (see
        # pallas_pair.direct_space_pallas)
        self.strict_pairs = bool(strict_pairs)
        # multi-chip: a jax.sharding.Mesh shards the pair sweep's row tiles
        # and the per-atom arrays over the atom axis (parallel/mesh.py)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.pallas_interpret = pallas_interpret
        self._mesh_size = int(mesh.devices.size) if mesh is not None else 1
        # force-inert particles (massless, non-vsite — EDL image charges,
        # mesh ghosts): their forces are discarded by the integrator and
        # nothing redistributes them, so inert-inert pair interactions are
        # dynamically irrelevant and the step's pair list culls them
        # (energies still use an un-culled list).  At EDL scale images are
        # ~47% of all atoms and spatially segregated, so this removes a
        # large fraction of the pair sweep.
        inert = np.asarray(system.inv_masses) == 0
        vidx = np.asarray(system.vsite_index).reshape(-1)
        if vidx.size:
            inert[vidx] = False
        self._inert_mask = inert if inert.any() else None
        if pair_kernel == "auto":
            # the Pallas kernel needs a real TPU; CPU tests use the jnp path
            pair_kernel = ("pallas" if jax.default_backend() != "cpu"
                           else "dense")
        self.pair_kernel = pair_kernel
        # production sweep mode: the Morton AABB tile-pair list culls the
        # x/y cross-section the z band cannot (~2x fewer pair slots) and
        # skips exclusion integer ops on tiles without excluded pairs; the
        # z band remains for fold_exc14=True (kernel-folded 1-4s) and the
        # row-sharded multi-chip path
        self.pair_mode = "dense"
        if self.pair_kernel == "pallas":
            self.pair_mode = "band" if (fold_exc14 or self._mesh_size > 1) \
                else "plist"
        self.skin = 0.1
        # band_atoms: atoms inside any (cutoff + sort-staleness skin)
        # z-window, from the MAX z-local density of the initial
        # configuration when available (an EDL slab's liquid region is ~10%
        # denser than the box mean; a mean-density estimate under-covers
        # there and the coverage check would rightly poison the run)
        band_atoms = 0.0
        if box_hint is not None and system.n_atoms > 0:
            lz = float(np.asarray(box_hint).reshape(-1)[2])
            win = system.r_cutoff + 0.1
            if pos_hint is not None:
                zw = np.asarray(pos_hint)[:, 2] % lz
                edges = np.arange(0.0, lz + 0.05, 0.05)
                hist = np.histogram(zw, bins=edges)[0]
                kwin = max(1, int(np.ceil(win / 0.05)))
                wrap = np.concatenate([hist, hist[:kwin]])
                band_atoms = float(np.convolve(
                    wrap, np.ones(kwin), mode="valid").max()) * 1.10
            else:
                band_atoms = win * (system.n_atoms / lz) * 1.08
        # pick the tile size minimizing the banded sweep's pair count (the
        # band width quantizes to whole tiles, so the optimum shifts with
        # system size and density); the per-step coverage check still
        # guards the final choice at runtime
        # band_w without the old +1 tile of slack: the in-step coverage
        # check now triggers a cache rebuild and (if still uncovered) an
        # exact full-sweep fallback, so a tight band is safe and saves one
        # whole column tile per row tile (~16% of the kernel at 19.5k)
        self.plist_sort = "morton"
        if pair_ts:
            self.pair_ts = int(pair_ts)
            # a forced tile size still gets the sort-key choice (z slabs vs
            # morton bricks) from the exact candidate enumeration — without
            # this, forced-ts A/Bs silently switch narrow boxes to morton
            if self.pair_mode == "plist" and pos_hint is not None \
                    and box_hint is not None:
                cnts = {key: pallas_pair.count_candidates_np(
                            pos_hint, box_hint, self.pair_ts,
                            system.r_cutoff + self.skin, mode=key,
                            inert=self._inert_mask)
                        for key in ("z", "morton")}
                self.plist_sort = min(cnts, key=cnts.get)
        elif self.pair_mode == "plist":
            # jointly pick sort key and tile size minimizing (pair slots +
            # per-entry overhead) from the exact candidate enumeration of
            # the initial configuration: thin z slabs win when the box
            # cross-section is under ~2 cutoffs (transverse culling is
            # impossible there), Morton blobs win on fat boxes; smaller
            # tiles cull tighter but pay more grid steps
            best = None
            if pos_hint is not None and box_hint is not None:
                for key in ("z", "morton"):
                    for cand in (128, 256, 384):
                        cnt = pallas_pair.count_candidates_np(
                            pos_hint, box_hint, cand,
                            system.r_cutoff + self.skin, mode=key,
                            inert=self._inert_mask)
                        cost = cnt * (cand * cand + 6000)
                        if best is None or cost < best[0]:
                            best = (cost, cand, key)
            else:
                best = (0, 256, "morton")
            self.pair_ts = best[1]
            self.plist_sort = best[2]
        else:
            best = None
            for cand in (512, 640, 768):
                n_pad = -(-system.n_atoms // cand) * cand
                n_tiles = n_pad // cand
                w = int(np.ceil(band_atoms / cand)) if band_atoms else 0
                if w and pallas_pair.band_eligible(n_pad, cand, w):
                    cost = n_tiles * (w + 1) * cand * cand
                else:
                    cost = n_pad * n_pad // 2
                if best is None or cost < best[0]:
                    best = (cost, cand)
            self.pair_ts = best[1]
        self.band_w = (int(np.ceil(band_atoms / self.pair_ts))
                       if band_atoms else 0)
        # pair-list capacity: exact initial count x drift margin; the
        # runtime overflow flag + full-sweep fallback + cache rebuild
        # guard the margin, so a rare overshoot costs one slow step
        self.plist_cap = 0
        if self.pair_mode == "plist":
            n_pad = -(-system.n_atoms // self.pair_ts) * self.pair_ts
            n_tiles = n_pad // self.pair_ts
            full = n_tiles * (n_tiles + 1) // 2
            if pos_hint is not None and box_hint is not None:
                cnt = pallas_pair.count_candidates_np(
                    pos_hint, box_hint, self.pair_ts,
                    system.r_cutoff + self.skin, mode=self.plist_sort,
                    inert=self._inert_mask)
                self.plist_cap = min(full, int(cnt * 1.6) + 64)
            else:
                self.plist_cap = full
        # first-atom-frame ("nowrap") axes for the plist kernel: replace
        # the per-pair minimum-image round-wrap with (ts,1)/(1,ts) wraps
        # into the row tile's frame wherever the sort's tile extents fit
        # inside L/2 - rc_cand (z-slab sorts qualify on z, Morton bricks
        # often on all three).  Exactness is re-verified per step against
        # current positions (pallas_pair.plist_coverage_bad).
        self.plist_nowrap = (False, False, False)
        if (self.pair_mode == "plist" and self.plist_cap > 0
                and pos_hint is not None and box_hint is not None):
            self.plist_nowrap = pallas_pair.nowrap_axes_np(
                pos_hint, box_hint, self.pair_ts,
                system.r_cutoff + self.skin, mode=self.plist_sort)
        self.pair_tables = allpairs.build_pair_tables(
            system.n_atoms, system.lj_type, system.acoef, system.bcoef,
            system.exclusions, system.lj_group, system.lj_group_allowed,
            exc_idx=system.exc_idx, exc_qq=system.exc_qq,
            exc_c6=system.exc_c6, exc_c12=system.exc_c12,
            charges=system.charges, fold_exc14=fold_exc14)
        # Bonded/Drude/Thole: molecule-batched dense evaluation (constant
        # one-hot matmuls per molecule type, ops/mol_terms.py) for every
        # molecule that is a contiguous copy of a repeated species; the
        # sparse gather path keeps only the leftovers.  Systems with
        # pathologically many distinct species stay fully sparse (the dense
        # path would bloat compile time for no win).
        # 1-4 exceptions route to the dense path too (intra-molecular); with
        # fold_exc14=True they live in the pair kernel instead (costs ~20
        # VPU slots + 2 MXU dots per pair there — measured slower once the
        # dense path exists)
        def build_term_eval(sysm):
            exc_mask = self.pair_tables["exc_term_mask"]
            mt, leftover = mol_terms.build_mol_tables(sysm, exc_mask=exc_mask)
            if len(mt) > 32:
                mt = []
                leftover = None
            if leftover is not None and "exception" in leftover:
                exc_mask = leftover.pop("exception")
            return mt, term_forces.build_term_tables(
                sysm, exc_keep_mask=exc_mask, keep_masks=leftover)

        self.mol_types, self.term_tables = build_term_eval(system)
        # Force-path variant with constraint-null springs dropped: a spring
        # term whose every internal coordinate is fixed by constraints
        # (flexibleConstraints=True bond springs on constrained pairs, water
        # HOH angle springs inside the rigid triangle) exerts force only in
        # the constrained subspace, which the kick's RATTLE projection
        # removes exactly — so the MD step (want_energy=False) skips them.
        # Energy queries keep the full tables for OpenMM-parity reporting.
        fsys = _drop_constraint_null_terms(system)
        self.mol_types_force, self.term_tables_force = (
            (self.mol_types, self.term_tables) if fsys is None
            else build_term_eval(fsys))
        # reciprocal-space method: the exact k-sum matmul (ops/ewald.py) or
        # FFT PME (ops/pme.py); "auto" picks per system from the measured
        # cost models (exact wins for every bundled reference workload)
        self.pme_grid = None
        if recip == "auto":
            recip = "exact"
            if box_hint is not None and system.ewald_beta > 0:
                recip, _ = pme.choose_reciprocal(
                    system.n_atoms, system.kmax, np.asarray(box_hint))
        if recip == "pme":
            if box_hint is None:
                raise ValueError("recip='pme' requires box_hint")
            self.pme_grid = pme.choose_grid(np.asarray(box_hint))
        if recip == "exact_fused" and self._mesh_size > 1:
            # the fused kernel has no shard_map wiring yet; the matmul
            # formulation shards fine under the XLA partitioner
            recip = "exact"
        if (recip == "exact" and ewald_pallas.FUSED_AUTO
                and self._mesh_size == 1
                and jax.default_backend() != "cpu"):
            recip = "exact_fused"
        self.recip_method = recip

    # -- virtual sites ----------------------------------------------------
    def place_vsites(self, pos):
        s = self.system
        return vsites.compute_vsites(pos, s.vsite_index, s.vsite_parents,
                                     s.vsite_origin_w, s.vsite_x_w,
                                     s.vsite_y_w, s.vsite_local)

    # -- spatial-sort cache for the tiled pair sweeps ---------------------
    @property
    def uses_band(self) -> bool:
        """True when the hot path carries a sorted PairCache (either the
        Morton tile-pair list or the z band)."""
        if self.pair_kernel != "pallas":
            return False
        if self.pair_mode == "plist":
            return self.plist_cap > 0
        if self.band_w < 1:
            return False
        # eligibility is a property of the REAL tile ring (mesh tile
        # padding appends inert tiles outside the circular band)
        n_pad = ((self.system.n_atoms + self.pair_ts - 1)
                 // self.pair_ts) * self.pair_ts
        return pallas_pair.band_eligible(n_pad, self.pair_ts, self.band_w)

    def make_pair_cache(self, pos_raw, box):
        """Sorted-permutation + permuted-statics cache (device-side, callable
        under jit).  Refresh every few dozen steps; the per-call coverage
        check makes staleness safe."""
        if self.pair_mode == "plist":
            return pallas_pair.make_pair_cache(
                self.place_vsites(pos_raw), box,
                jnp.asarray(self.system.charges), self.pair_tables,
                self.pair_ts, mode=self.plist_sort, cap=self.plist_cap,
                rc_cand=self.system.r_cutoff + self.skin,
                inert=self._inert_mask, nowrap=self.plist_nowrap)
        return pallas_pair.make_pair_cache(
            self.place_vsites(pos_raw), box,
            jnp.asarray(self.system.charges), self.pair_tables, self.pair_ts,
            tile_multiple=max(self._mesh_size, 1))

    def pair_cache_stale(self, pos_raw, box, cache):
        """Device bool: current positions are no longer covered under this
        cache's sort (callers should rebuild the cache)."""
        pos = self.place_vsites(pos_raw)
        if self.pair_mode == "plist":
            n = pos.shape[0]
            pad = cache.perm.shape[0] - n
            pos_sorted = jnp.concatenate(
                [pos, jnp.full((pad, 3), 1e6, jnp.float32)],
                axis=0)[cache.perm]
            return pallas_pair.plist_coverage_bad(
                pos_sorted, box, cache, self.pair_ts, self.system.r_cutoff,
                nowrap=self.plist_nowrap)
        return pallas_pair.band_coverage_bad(
            pos, box, cache, self.pair_ts,
            self.band_w, self.system.r_cutoff)

    # -- grad-differentiated terms ---------------------------------------
    def _smooth_energy(self, pos, box):
        """The few remaining terms whose force comes from jax.grad: Ewald
        reciprocal (matmul backward, no scatter), TT damping (small), user
        externals.  Bonded/Drude/Thole live in ops/term_forces.py."""
        s = self.system
        terms = {}
        if s.ewald_beta > 0:
            if self.recip_method == "pme":
                terms["coul_recip"] = pme.reciprocal_energy_pme(
                    pos, box, jnp.asarray(s.charges), s.ewald_beta,
                    self.pme_grid)
            elif self.recip_method == "exact_fused":
                # Pallas-fused exact k-sum: no (N, K)-sized HBM
                # intermediates (ops/ewald_pallas.py); grad(pos) runs the
                # fused force kernel via its custom_vjp
                terms["coul_recip"] = ewald_pallas.reciprocal_energy_fused(
                    pos, box, jnp.asarray(s.charges), s.ewald_beta,
                    tuple(int(k) for k in s.kmax), 256,
                    self.pallas_interpret)
            else:
                terms["coul_recip"] = ewald.reciprocal_energy(
                    pos, box, s.charges, s.ewald_beta, s.kmax,
                    chunk=self.ewald_chunk, mirror=self.image_mirror)
        if s.cmap_atoms.shape[0] > 0:
            # CMAP cross-terms (oplspsffile.py:1134-1169, force group 3):
            # term counts are tiny, so the jax.grad force path costs
            # nothing measurable
            terms["cmap"] = cmap.cmap_energy(
                pos, box, s.cmap_atoms, s.cmap_map, s.cmap_coeffs,
                s.cmap_res)
        if int(np.asarray(s.nbt_idx).max(initial=0)) > 0:
            # the reference truncates NBTHOLE at a hard-coded 0.5 nm
            # (oplspsffile.py:1407), not the system cutoff
            terms["nbthole"] = nonbonded.nbthole_energy(
                pos, box, s.nbt_idx, s.nbt_alpha, s.nbt_coef, s.charges,
                s.exclusions, min(0.5, s.r_cutoff))
        if s.gb is not None:
            # implicit solvent (oplspsffile.py:1532-1590); all-pair GB has
            # no bonded exclusions, so it rides the grad path whole
            terms["gb"] = gb.gb_energy(pos, jnp.asarray(s.charges), s.gb)
        if s.tt_donors.shape[0] > 0:
            terms["tt_damping"] = nonbonded.tt_damping_energy(
                pos, box, s.tt_donors, s.tt_charges, s.tt_dipole_mask,
                s.exclusions, s.tt_b, s.tt_cutoff)
        for i, f in enumerate(self.external_forces):
            if getattr(f, "analytic_force", None) is None:
                terms[f"external_{i}"] = f(pos, box)
        return sum(terms.values(), jnp.zeros((), pos.dtype)), terms

    # -- full evaluation --------------------------------------------------
    def energy_forces(self, pos_raw, box, want_energy: bool = True,
                      pair_cache=None, return_cov: bool = False):
        """Returns (terms dict incl. every component, forces on real dofs)
        — plus the band-coverage flag when return_cov=True (the MD step
        feeds it back as next step's cache-rebuild trigger, so the whole
        coverage machinery costs ONE check per step).

        want_energy=False lets the Pallas pair kernel skip its per-tile
        energy reductions (the MD step consumes only forces; the jnp-side
        term energies are byproducts of their force computation either way).
        pair_cache (a pallas_pair.PairCache) skips the per-call z-sort.
        """
        s = self.system
        pos = self.place_vsites(pos_raw)
        cov_bad = jnp.zeros((), bool)

        if self.pair_kernel == "pallas" and self._mesh_size > 1:
            # row-sharded multi-chip sweep (tiles sharded over the mesh's
            # atom axis, column reaction psum'd over ICI).  No in-step
            # full-sweep fallback here: a coverage trip means ONE step ran
            # with a band-stale pair list (the classical Verlet-skin miss,
            # ~never at the 0.1 nm skin and default refresh) and the flag
            # still forces an immediate rebuild for the next step.
            charges_j = jnp.asarray(s.charges)
            if pair_cache is None:
                pair_cache = pallas_pair.make_pair_cache(
                    pos, box, charges_j, self.pair_tables, self.pair_ts,
                    tile_multiple=self._mesh_size)
            e_lj, e_coul_dir, e_corr, e14c, e14l, f_direct = \
                pallas_pair.banded_sweep_sharded(
                    self.mesh, self.mesh_axis, pos, box, charges_j,
                    self.pair_tables, s.ewald_beta, s.r_cutoff,
                    self.pair_ts, self.band_w, cache=pair_cache,
                    want_energy=want_energy,
                    interpret=self.pallas_interpret, r_switch=s.r_switch)
            e_lj, e_coul_dir, e_corr, f_direct = \
                pallas_pair.residual_adjustment(
                    pos, box, charges_j, self.pair_tables, s.ewald_beta,
                    s.r_cutoff, e_lj, e_coul_dir, e_corr, f_direct,
                    r_switch=s.r_switch)
            cov_bad = pallas_pair.band_coverage_bad(
                pos, box, pair_cache, self.pair_ts, self.band_w,
                s.r_cutoff)
        elif self.pair_kernel == "pallas":
            e_lj, e_coul_dir, e_corr, e14c, e14l, f_direct, cov_bad = \
                pallas_pair.direct_space_pallas(
                    pos, box, jnp.asarray(s.charges), self.pair_tables,
                    s.ewald_beta, s.r_cutoff, ts=self.pair_ts,
                    band_w=self.band_w, want_energy=want_energy,
                    cache=pair_cache, with_flag=True, mode=self.pair_mode,
                    plist_cap=self.plist_cap, skin=self.skin,
                    plist_sort=self.plist_sort, r_switch=s.r_switch,
                    strict=self.strict_pairs, nowrap=self.plist_nowrap)
        else:
            e_lj, e_coul_dir, e_corr, e14c, e14l, f_direct = \
                allpairs.direct_space_dense(
                    pos, box, jnp.asarray(s.charges), self.pair_tables,
                    s.ewald_beta, s.r_cutoff, row_block=self.row_block,
                    r_switch=s.r_switch)

        (e_smooth, terms), grad_smooth = jax.value_and_grad(
            self._smooth_energy, has_aux=True)(pos, box)
        t_terms, t_idx, t_slots = (self.term_tables if want_energy
                                   else self.term_tables_force)
        mol_types = self.mol_types if want_energy else self.mol_types_force
        term_energies, f_terms = term_forces.energies_and_forces(
            pos, box, t_terms, t_idx, t_slots)
        if mol_types:
            mol_energies, f_mol = mol_terms.energies_and_forces(
                pos, box, mol_types, s.n_atoms)
            f_terms = f_terms + f_mol
            for k, v in mol_energies.items():
                term_energies[k] = term_energies.get(k, 0.0) + v
        terms = dict(terms)
        for name in ("bond", "angle", "urey_bradley", "dihedral", "improper",
                     "drude", "thole", "exception_coul", "exception_lj"):
            terms[name] = term_energies.get(name, jnp.zeros((), pos.dtype))
        # kernel-handled 1-4 exceptions (+ any irregular ones from the term
        # pass already in exception_coul/lj above)
        terms["exception_coul"] = terms["exception_coul"] + e14c
        terms["exception_lj"] = terms["exception_lj"] + e14l
        terms["lj"] = e_lj
        terms["coul_direct"] = e_coul_dir
        terms["coul_excl_corr"] = e_corr
        if s.ewald_beta > 0:
            terms["coul_self"] = nonbonded.ewald_self_energy(
                s.charges, s.ewald_beta, box)
        if s.use_dispersion_correction:
            terms["lj_lrc"] = nonbonded.dispersion_correction(
                box, s.disp_coef_a2, s.disp_coef_b, s.r_cutoff,
                r_switch=s.r_switch)

        forces = f_direct + f_terms - grad_smooth
        # externals with hand-written forces (full-N masked elementwise; the
        # autodiff pullback of their subset gathers is a whole-array
        # scatter-add, ~0.4 ms at 40k atoms)
        for i, f in enumerate(self.external_forces):
            af = getattr(f, "analytic_force", None)
            if af is not None:
                terms[f"external_{i}"] = jax.lax.stop_gradient(f(pos, box))
                forces = forces + af(pos, box)
        forces = vsites.redistribute_forces(
            pos_raw, forces, s.vsite_index, s.vsite_parents, s.vsite_origin_w,
            s.vsite_x_w, s.vsite_y_w, s.vsite_local)
        if return_cov:
            return terms, forces, cov_bad
        return terms, forces

    def potential_energy(self, pos_raw, box):
        terms, _ = self.energy_forces(pos_raw, box)
        return sum(terms.values()), terms

    # Force-group decomposition mirroring oplspsffile.py:169-177 + force.py
    GROUP_MAP = {
        1: ("bond",),
        2: ("angle", "urey_bradley"),
        3: ("dihedral",),
        4: ("improper",),
        5: ("lj", "coul_direct", "coul_recip", "coul_self", "coul_excl_corr",
            "exception_coul", "exception_lj", "lj_lrc", "nbthole"),
        7: ("drude", "thole"),
        9: ("tt_damping",),
    }

    def group_energies(self, terms):
        out = {}
        for g, keys in self.GROUP_MAP.items():
            vals = [terms[k] for k in keys if k in terms]
            if vals:
                out[g] = sum(vals)
        ext = [v for k, v in terms.items() if k.startswith("external_")]
        if ext:
            out[0] = sum(ext)
        return out
