"""Fixed-shape Verlet neighbor list built from a cell list, jit/scan-safe.

The reference needs no neighbor list of its own (OpenMM's CUDA platform owns
the nonbonded tiles); a standalone engine does.  TPU-native design decisions:

* Everything is static-shape: candidate window, per-cell capacity M and
  per-atom capacity K are fixed at bind time; overflow raises a flag that the
  host driver checks between scan chunks (then re-binds with larger capacity).
* The build is gather/sort/one-unique-scatter only — no data-dependent shapes.
* Excluded pairs (1-2/1-3/1-4/Drude/lone-pair, oplspsffile.py:1437-1476) are
  marked with -1 *at build time*, so the per-step force kernel has no
  exclusion logic at all and is a pure gather+VPU reduction.
* The list stores both directions of every pair, so per-atom forces are a sum
  over the K axis — no scatter in the hot loop.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.pbc import minimum_image, wrap_positions

i32 = jnp.int32
f32 = jnp.float32


@struct.dataclass
class NeighborListConfig:
    """Static geometry/capacity parameters (hashable, baked into the jit)."""
    r_list: float = struct.field(pytree_node=False)       # cutoff + skin
    skin: float = struct.field(pytree_node=False)
    dims: tuple = struct.field(pytree_node=False)         # cells per axis
    window: tuple = struct.field(pytree_node=False)       # search cells per axis
    cell_capacity: int = struct.field(pytree_node=False)  # M
    capacity: int = struct.field(pytree_node=False)       # K
    max_exclusions: int = struct.field(pytree_node=False)
    chunk: int = struct.field(pytree_node=False, default=1024)


@struct.dataclass
class NeighborList:
    idx: jnp.ndarray       # (N,K) i32, -1 padded / excluded
    ref_pos: jnp.ndarray   # (N,3) positions at build time
    did_overflow: jnp.ndarray  # () bool — capacity exceeded, results invalid
    needs_rebuild: jnp.ndarray  # () bool — displacement since build > skin/2


def make_config(box, r_cutoff, skin=0.1, n_atoms=None, density_estimate=None,
                capacity=None, cell_capacity=None, max_exclusions=32) -> NeighborListConfig:
    """Choose static capacities from the initial box and atom count."""
    box = np.asarray(box, np.float64)
    r_list = float(r_cutoff) + float(skin)
    # Target cell edge ~ r_list/2 (5^3 window) with 5% shrink margin.
    target = max(r_list / 2.0 * 1.05, 1e-3)
    dims = tuple(int(max(1, math.floor(b / target))) for b in box)
    window = tuple(int(min(5, d)) for d in dims)
    # guarantee coverage: window*edge >= ... if dims < 5 window covers all.
    n_cells = dims[0] * dims[1] * dims[2]
    if cell_capacity is None:
        mean_occ = (n_atoms or 1) / max(n_cells, 1)
        cell_capacity = int(max(8, math.ceil(mean_occ * 2.0)))
    if capacity is None:
        vol = float(np.prod(box))
        rho = (n_atoms or 1) / vol
        est = 4.0 / 3.0 * math.pi * r_list ** 3 * rho
        capacity = int(math.ceil(est * 1.4 / 128.0) * 128) + 128
        capacity = min(capacity, n_atoms or capacity)
    return NeighborListConfig(
        r_list=r_list, skin=float(skin), dims=dims, window=window,
        cell_capacity=int(cell_capacity), capacity=int(capacity),
        max_exclusions=int(max_exclusions))


def _cell_ids(pos, box, dims):
    frac = wrap_positions(pos, box) / box
    d = jnp.array(dims, i32)
    coords = jnp.clip((frac * d.astype(pos.dtype)).astype(i32), 0, d - 1)
    return coords, coords[:, 0] + d[0] * (coords[:, 1] + d[1] * coords[:, 2])


def build(pos, box, exclusions, cfg: NeighborListConfig) -> NeighborList:
    """Build the (N,K) neighbor list.  Pure function of positions/box."""
    n = pos.shape[0]
    exclusions = jnp.asarray(exclusions)
    dims = cfg.dims
    n_cells = dims[0] * dims[1] * dims[2]
    M, K = cfg.cell_capacity, cfg.capacity

    coords, cid = _cell_ids(pos, box, dims)
    order = jnp.argsort(cid)                      # atoms sorted by cell
    cid_sorted = cid[order]
    counts = jax.ops.segment_sum(jnp.ones((n,), i32), cid, num_segments=n_cells)
    cell_start = jnp.concatenate([jnp.zeros((1,), i32), jnp.cumsum(counts)[:-1]])
    cell_overflow = jnp.max(counts) > M
    # cell_table[c, m] = atom index (or -1): a gather from the sorted order.
    slot = cell_start[:, None] + jnp.arange(M, dtype=i32)[None, :]
    valid = jnp.arange(M, dtype=i32)[None, :] < counts[:, None]
    cell_table = jnp.where(valid, order[jnp.clip(slot, 0, n - 1)], -1)  # (n_cells, M)

    # Candidate cells: window offsets around each atom's cell.
    wx, wy, wz = cfg.window
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(wx, dtype=i32) - wx // 2,
        jnp.arange(wy, dtype=i32) - wy // 2,
        jnp.arange(wz, dtype=i32) - wz // 2, indexing="ij"), -1).reshape(-1, 3)
    d = jnp.array(dims, i32)
    W = offs.shape[0] * M
    r2max = jnp.asarray(cfg.r_list ** 2, pos.dtype)

    def process_chunk(args):
        idx_chunk, = args  # (B,) atom indices (may include padding = n-1 dupes)
        p = pos[idx_chunk]                                    # (B,3)
        c = coords[idx_chunk]                                 # (B,3)
        nb_cells = (c[:, None, :] + offs[None, :, :]) % d     # (B,O,3)
        nb_cid = nb_cells[..., 0] + d[0] * (nb_cells[..., 1] + d[1] * nb_cells[..., 2])
        cand = cell_table[nb_cid].reshape(p.shape[0], W)      # (B,W)
        cpos = pos[jnp.maximum(cand, 0)]                      # (B,W,3)
        dr = minimum_image(p[:, None, :] - cpos, box)
        r2 = jnp.sum(dr * dr, -1)
        mask = (cand >= 0) & (cand != idx_chunk[:, None]) & (r2 < r2max)
        # Scatter-free-ish compaction: unique-index scatter into (B,K+1).
        dest = jnp.cumsum(mask.astype(i32), axis=1) - 1        # slot per hit
        dest = jnp.where(mask, jnp.minimum(dest, K), K)        # overflow -> col K
        rows = jnp.broadcast_to(jnp.arange(p.shape[0])[:, None], cand.shape)
        out = jnp.full((p.shape[0], K + 1), -1, i32)
        out = out.at[rows.reshape(-1), dest.reshape(-1)].max(
            jnp.where(mask, cand, -1).reshape(-1), mode="drop")
        n_found = jnp.sum(mask, axis=1)
        out = out[:, :K]
        # Mark excluded pairs with -1 here, inside the chunk, so the (B,K,E)
        # comparison never materializes at (N,K,E) scale.
        if exclusions.shape[1] > 0:
            excl = exclusions[idx_chunk]                      # (B,E)
            is_excl = jnp.any(out[:, :, None] == excl[:, None, :], axis=-1)
            out = jnp.where(is_excl & (out >= 0), -1, out)
        return out, n_found

    chunk = min(cfg.chunk, n)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    atom_idx = jnp.concatenate([jnp.arange(n, dtype=i32),
                                jnp.full((n_pad - n,), n - 1, i32)])
    idx_all, nf_all = jax.lax.map(process_chunk,
                                  (atom_idx.reshape(-1, chunk),))
    idx = idx_all.reshape(n_pad, K)[:n]
    n_found = nf_all.reshape(n_pad)[:n]
    list_overflow = jnp.max(n_found) > K

    return NeighborList(
        idx=idx, ref_pos=pos,
        did_overflow=cell_overflow | list_overflow,
        needs_rebuild=jnp.zeros((), bool))


def check_rebuild(nbrs: NeighborList, pos, box, cfg: NeighborListConfig):
    """Flag a rebuild once any atom moved more than skin/2 since build."""
    dr = minimum_image(pos - nbrs.ref_pos, box)
    max_d2 = jnp.max(jnp.sum(dr * dr, -1))
    return nbrs.replace(needs_rebuild=max_d2 > (0.5 * cfg.skin) ** 2)


def maybe_rebuild(nbrs: NeighborList, pos, box, exclusions,
                  cfg: NeighborListConfig) -> NeighborList:
    """Conditionally rebuild inside jit (lax.cond keeps shapes static)."""
    nbrs = check_rebuild(nbrs, pos, box, cfg)

    def rebuild(_):
        new = build(pos, box, exclusions, cfg)
        return new.replace(did_overflow=new.did_overflow | nbrs.did_overflow)

    return jax.lax.cond(nbrs.needs_rebuild, rebuild, lambda _: nbrs, None)


def dense_neighbor_list(n: int) -> NeighborList:
    """All-pairs list for small systems/tests: neighbor k of atom i is every
    other atom.  K = n-1."""
    idx = jnp.broadcast_to(jnp.arange(n, dtype=i32)[None, :], (n, n))
    # drop the diagonal by shifting each row
    mask = idx != jnp.arange(n, dtype=i32)[:, None]
    packed = jnp.where(mask, idx, -1)
    packed = jnp.sort(packed, axis=1, descending=True)[:, : n - 1]
    return NeighborList(idx=packed, ref_pos=jnp.zeros((n, 3), f32),
                        did_overflow=jnp.zeros((), bool),
                        needs_rebuild=jnp.zeros((), bool))


def apply_exclusions(nbrs: NeighborList, exclusions) -> NeighborList:
    idx = nbrs.idx
    is_excl = jnp.any(idx[:, :, None] == exclusions[:, None, :], axis=-1) & (idx >= 0)
    return nbrs.replace(idx=jnp.where(is_excl, -1, idx))
