"""Pallas TPU kernel for the dense all-pairs nonbonded sweep.

Same math as ops/allpairs.py (LJ + Ewald direct + in-pass exclusion
corrections) but hand-tiled for the TPU memory hierarchy:

* the whole column set (positions, charges, type one-hots, exclusion bits —
  ~1 MB for the reference workloads) stays resident in VMEM; the grid walks
  row tiles, so each pair block is computed straight out of VMEM with no
  HBM round-trips between the type-lookup matmul (MXU) and the pair math
  (VPU);
* rows use (tm,1) column-vector layout and columns (1,tn) row-vector layout
  so every (tm,tn) pair quantity is a clean broadcast;
* forces are accumulated analytically in-kernel — no autodiff, no scatter.

Fallback for CPU tests / oversized systems is ops/allpairs.direct_space_dense
(identical semantics; parity is covered by tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import ONE_4PI_EPS0
from .allpairs import lj_switch

_SQRT_PI = 1.7724538509055159
MAX_EXCL_OFFSET = 31

# Safety slack (nm) for the first-atom-frame minimum image on "nowrap"
# axes: the tile-extent budgets subtract this on top of rc_cand, covering
# extent drift between the build-time check and the per-step coverage
# re-check (bounded by the staleness trigger at well under 0.1 nm).  See
# _plist_kernel's _wrap.
NOWRAP_SLACK = 0.2


@functools.lru_cache(maxsize=8)
def _pfit(beta: float, r_cutoff: float, deg: int = 10):
    """Chebyshev fit of P(u) on u in [0, (1.05 beta rc)^2], where the Ewald
    direct/correction forces take the div/exp/erfc-free forms

        f_c = qq (1/r^3 + beta^3 P(u)),   f_x = qq beta^3 P(u),   u = beta^2 r^2

    via G(x) = erfc(x) + (2/sqrt(pi)) x exp(-x^2) = 1 + x^3 P(x^2).  The
    small-u branch uses the series of P (the direct formula cancels
    catastrophically below u ~ 0.25).  f32 Horner error ~5e-6 absolute on a
    P range of -0.75..-0.05 — far below pairwise force noise.  Valid for
    every in-cutoff pair and every excluded (intramolecular) pair; beyond
    1.05 rc the result is masked (direct) or physically unreachable
    (exclusions span < 0.7 nm)."""
    import math as _m
    umax = (1.05 * beta * r_cutoff) ** 2
    u = np.linspace(0.0, umax, 40001)
    x = np.sqrt(u)
    big = u > 0.25
    with np.errstate(divide="ignore", invalid="ignore"):
        try:
            from scipy.special import erfc as _erfc
            gm1 = _erfc(x) + 2.0 / _SQRT_PI * x * np.exp(-u) - 1.0
        except ImportError:
            _e = np.vectorize(_m.erfc)
            gm1 = _e(x) + 2.0 / _SQRT_PI * x * np.exp(-u) - 1.0
        p_big = np.where(big, gm1 / np.maximum(x * u, 1e-300), 0.0)
    acc = np.zeros_like(u)
    term = np.ones_like(u)
    for n_ in range(30):
        acc = acc + term / (2 * n_ + 3)
        term = term * (-u) / (n_ + 1)
    p_small = -(4.0 / _SQRT_PI) * acc
    pex = np.where(big, p_big, p_small)
    c = np.polynomial.chebyshev.Chebyshev.fit(
        u, pex, deg, domain=[0, umax]).convert(
        kind=np.polynomial.Polynomial).coef
    return tuple(float(v) for v in c)


@functools.lru_cache(maxsize=8)
def _pfit_scaled(beta: float, r_cutoff: float, deg: int = 10):
    """_pfit coefficients with beta folded in: the kernels evaluate the
    Horner chain directly in r^2 (c_k' = c_k beta^(2k+3)), saving the
    per-pair u = beta^2 r^2 and w *= beta^3 multiplies."""
    c = _pfit(beta, r_cutoff, deg)
    return tuple(float(ck) * float(beta) ** (2 * k + 3)
                 for k, ck in enumerate(c))


class PairCache(NamedTuple):
    """Carried spatial-sort state for the tiled sweeps: the permutation plus
    every permuted static table (row layout and pre-transposed column
    layout), so a step with a cached sort only gathers/transposes positions.
    Refreshed every few dozen steps; staleness is safe because the per-step
    coverage check runs against CURRENT positions.

    Two sort modes share the container: "z" (wrapped-z order for the banded
    sweep) and "morton" (3-D Z-order for the AABB-culled tile-pair-list
    sweep, which also fills plist/cand/overflow)."""
    perm: jnp.ndarray        # (n_pad,) i32 sorted position -> original index
    invperm: jnp.ndarray     # (n_pad,) i32
    q2d: jnp.ndarray         # (n_pad,1) f32 sorted charges
    ab: jnp.ndarray          # (n_pad,2T or 4T) f32 sorted LJ (+1-4) rows
    bits2d: jnp.ndarray      # (n_pad,1) i32 sorted exclusion masks
    bits14_2d: jnp.ndarray   # (n_pad,1) i32 sorted 1-4 exception masks
    grows: jnp.ndarray       # (n_pad,G) f32 sorted group rows
    qT: jnp.ndarray          # (1,n_pad)
    bitsT: jnp.ndarray       # (1,n_pad) i32
    bits14T: jnp.ndarray     # (1,n_pad) i32
    oidT: jnp.ndarray        # (1,n_pad) i32 original indices
    onehotT: jnp.ndarray     # (T,n_pad)
    gonehotT: jnp.ndarray    # (G,n_pad)
    # tile-pair-list fields (mode="morton"; zero-size placeholders for "z")
    plist: jnp.ndarray = None   # (cap,) i32, one packed word per entry:
    #                             row_tile<<17 | col_tile<<3 | flags
    #                             (bit0 active, bit1 has_excl, bit2
    #                             first-visit-of-row-tile).  Packed AND 1-D
    #                             because the array is scalar-prefetched to
    #                             SMEM (1 MiB): Mosaic pads the minor dim
    #                             of a 2-D SMEM operand to 128 lanes, so
    #                             even (cap,1) i32 ballooned 128x and
    #                             overflowed SMEM at EDL scale
    cand: jnp.ndarray = None    # (T,T) bool AABB-candidate tile pairs
    overflow: jnp.ndarray = None  # () bool: candidate count exceeded cap
    # (T,) bool: every real atom in the tile is force-inert (massless,
    # non-vsite — e.g. slaved image charges).  Inert-inert tile pairs are
    # culled from the FORCE path's pair list: their interactions produce
    # forces only on particles whose forces are discarded (inv_mass = 0,
    # no vsite redistribution), so dynamics are bit-identical.  Energy
    # queries build their own un-culled cache.
    tile_inert: jnp.ndarray = None
    # Tile-major stacked LJ/group table rows for the plist kernel: per row
    # tile k the rows [S*k*ts, S*(k+1)*ts) hold [A-rows; B-rows(; G-rows)]
    # so the kernel selects a, b (and the group-allowed mask) with ONE
    # (S*ts, K) x (K, ts) MXU dot against oh2T = [onehotT(; gonehotT)] —
    # block-diagonal in K when groups are present.  Device A/B
    # (tools/kernel_microbench.py, 19.5k bench): -14% kernel time vs the
    # two-dot form, bit-exact.
    ab2: jnp.ndarray = None     # (S*n_pad, K) f32
    oh2T: jnp.ndarray = None    # (K, n_pad) f32


def _morton_key(pos, box, n_pad):
    """3-D Z-order (Morton) key of wrapped positions, 6 bits per axis;
    padding slots sort to the end."""
    n = pos.shape[0]
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    w = pos - box_arr * jnp.floor(pos / box_arr)
    cell = jnp.clip((w / box_arr * 64.0).astype(jnp.int32), 0, 63)

    def spread(x):
        out = jnp.zeros_like(x)
        for b in range(6):
            out = out | (((x >> b) & 1) << (3 * b))
        return out

    key = (spread(cell[:, 0]) | (spread(cell[:, 1]) << 1)
           | (spread(cell[:, 2]) << 2))
    return jnp.concatenate(
        [key, jnp.full((n_pad - n,), np.int32(1 << 20), jnp.int32)])


def _tile_intervals(pos_sorted, valid, box, ts):
    """Per-tile circular AABBs along each axis: (cmean, lo, hi, nonempty)
    with shapes (T,3),(T,3),(T,3),(T,).  A tile straddling a periodic
    boundary is measured in two frames — wrapped [0,L) and half-shifted —
    and the narrower interval wins, which keeps it tight instead of
    box-wide (equivalent conservativeness to a circular mean but pure
    min/max, no trig; this runs in the per-step coverage check)."""
    n_pad = pos_sorted.shape[0]
    n_tiles = n_pad // ts
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    w = pos_sorted - box_arr * jnp.floor(pos_sorted / box_arr)
    w = w.reshape(n_tiles, ts, 3)
    v = valid.reshape(n_tiles, ts, 1)
    half = 0.5 * box_arr
    w2 = w - jnp.where(w >= half, box_arr, 0.0)     # half-shifted frame
    big = jnp.float32(1e30)
    lo1 = jnp.min(jnp.where(v, w, big), axis=1)
    hi1 = jnp.max(jnp.where(v, w, -big), axis=1)
    lo2 = jnp.min(jnp.where(v, w2, big), axis=1)
    hi2 = jnp.max(jnp.where(v, w2, -big), axis=1)
    use2 = (hi2 - lo2) < (hi1 - lo1)                # (T,3)
    lo_w = jnp.where(use2, lo2, lo1)
    hi_w = jnp.where(use2, hi2, hi1)
    cmean = 0.5 * (lo_w + hi_w)
    lo = lo_w - cmean
    hi = hi_w - cmean
    nonempty = valid.reshape(n_tiles, ts).any(axis=1)
    lo = jnp.where(nonempty[:, None], lo, 0.0)
    hi = jnp.where(nonempty[:, None], hi, 0.0)
    cmean = jnp.where(nonempty[:, None], cmean, 0.0)
    return cmean, lo, hi, nonempty


def _tile_pair_dist2(cmean, lo, hi, box):
    """(T,T) squared distance between per-tile circular AABBs (0 when they
    overlap); degenerate intervals wider than half the box count as
    overlapping along that axis."""
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    delta = jnp.mod(cmean[None, :, :] - cmean[:, None, :] + 0.5 * box_arr,
                    box_arr) - 0.5 * box_arr                   # (T,T,3) j-i
    gap = jnp.where(delta >= 0,
                    delta - hi[:, None, :] + lo[None, :, :],
                    -delta - hi[None, :, :] + lo[:, None, :])
    wide = (hi - lo) > 0.5 * box_arr                           # (T,3)
    gap = jnp.where(wide[:, None, :] | wide[None, :, :], 0.0, gap)
    gap = jnp.maximum(gap, 0.0)
    return jnp.sum(gap * gap, axis=-1)


def _padded_statics(n, pad, charges, tables):
    """Padded, original-order static row arrays."""
    has14 = tables.get("has_exc14", False)
    q2d = jnp.concatenate(
        [charges.reshape(-1, 1), jnp.zeros((pad, 1), jnp.float32)], axis=0)
    parts = [tables["arows"], tables["brows"]]
    if has14:
        parts += [tables["a14rows"], tables["b14rows"]]
    ab = np.concatenate(parts, axis=1).astype(np.float32)
    ab = jnp.concatenate(
        [jnp.asarray(ab), jnp.zeros((pad, ab.shape[1]), jnp.float32)], axis=0)
    bits2d = jnp.concatenate(
        [jnp.asarray(tables["excl_bits"]).reshape(-1, 1),
         jnp.zeros((pad, 1), jnp.int32)], axis=0)
    bits14_2d = jnp.concatenate(
        [jnp.asarray(tables["exc14_bits"] if has14 else
                     np.zeros(n, np.int32)).reshape(-1, 1),
         jnp.zeros((pad, 1), jnp.int32)], axis=0)
    onehot2d = jnp.concatenate(
        [jnp.asarray(tables["onehot"]),
         jnp.zeros((pad, tables["onehot"].shape[1]), jnp.float32)], axis=0)
    if tables["grows"] is not None:
        grows = jnp.concatenate(
            [jnp.asarray(tables["grows"]),
             jnp.zeros((pad, tables["grows"].shape[1]), jnp.float32)], axis=0)
        gonehot2d = jnp.concatenate(
            [jnp.asarray(tables["gonehot"]),
             jnp.zeros((pad, tables["gonehot"].shape[1]), jnp.float32)],
            axis=0)
    else:
        grows = jnp.zeros((n + pad, 1), jnp.float32)
        gonehot2d = jnp.zeros((n + pad, 1), jnp.float32)
    return q2d, ab, bits2d, bits14_2d, onehot2d, grows, gonehot2d


def make_pair_cache(pos, box, charges, tables, ts: int = 512,
                    mode: str = "z", cap: int = 0,
                    rc_cand: float = 0.0,
                    tile_multiple: int = 1,
                    inert=None,
                    nowrap=(False, False, False)) -> PairCache:
    """Sort atoms spatially and permute every static table (device-side;
    call under jit, e.g. inside the step's refresh branch).

    mode selects the sort key: "z" (wrapped z — optimal for boxes whose
    x/y cross-section is smaller than twice the cutoff, where transverse
    culling is geometrically impossible) or "morton" (3-D Z-order — wins
    on fat boxes).  cap > 0 additionally builds the AABB-culled candidate
    tile-pair list (capacity ``cap``, candidate radius ``rc_cand`` =
    cutoff + refresh skin) and per-pair exclusion flags so tiles without
    excluded pairs skip the integer mask ops entirely; the AABB interval
    culling is exact per tile pair, so a z-sorted list also beats the
    fixed worst-case band width of the banded sweep."""
    n = pos.shape[0]
    # tile_multiple > 1: round the tile count itself up to a multiple (the
    # row-sharded multi-chip sweep assigns n_tiles/n_dev row tiles per
    # device, so n_tiles must divide by the mesh size; extra rows are the
    # same far-away inert padding as the tail of the last real tile)
    blk = ts * max(int(tile_multiple), 1)
    n_pad = ((n + blk - 1) // blk) * blk
    pad = n_pad - n
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    if mode == "morton":
        keys = _morton_key(pos, box_arr, n_pad)
    else:
        lz = box_arr[2]
        zw = pos[:, 2] - lz * jnp.floor(pos[:, 2] / lz)
        keys = jnp.concatenate([zw.astype(jnp.float32),
                                jnp.full((pad,), 1e30, jnp.float32)])
    _, perm = jax.lax.sort((keys, iota), num_keys=2)
    invperm = jnp.zeros((n_pad,), jnp.int32).at[perm].set(iota)
    q2d, ab, bits2d, bits14_2d, onehot2d, grows, gonehot2d = _padded_statics(
        n, pad, charges, tables)
    q2d = q2d[perm]
    ab = ab[perm]
    bits2d = bits2d[perm]
    bits14_2d = bits14_2d[perm]
    grows = grows[perm]
    plist = cand = overflow = None
    if cap > 0:
        n_tiles = n_pad // ts
        pos_pad = jnp.concatenate(
            [pos.astype(jnp.float32), jnp.full((pad, 3), 1e6, jnp.float32)],
            axis=0)[perm]
        valid = perm < n
        cmean, lo, hi, nonempty = _tile_intervals(pos_pad, valid, box_arr, ts)
        d2 = _tile_pair_dist2(cmean, lo, hi, box_arr)
        pair_ok = nonempty[:, None] & nonempty[None, :]
        cand = (d2 <= jnp.float32(rc_cand) ** 2) & pair_ok
        ii = jnp.arange(n_tiles, dtype=jnp.int32)
        cand = cand | (jnp.eye(n_tiles, dtype=bool) & nonempty[:, None])
        if inert is not None:
            # cull inert-inert tile pairs from the FORCE path (see the
            # PairCache.tile_inert doc): pads count as inert.  Diagonal
            # entries stay — every nonempty row tile must be visited at
            # least once so its output block gets zero-initialized (an
            # unvisited block is VMEM garbage, and garbage forces on inert
            # atoms would NaN-poison the kick via NaN * inv_mass=0).
            inert_pad = jnp.concatenate(
                [jnp.asarray(inert, bool),
                 jnp.ones((pad,), bool)])[perm].reshape(n_tiles, ts)
            tile_inert = jnp.all(inert_pad, axis=1)
            cull = tile_inert[:, None] & tile_inert[None, :] \
                & ~jnp.eye(n_tiles, dtype=bool)
            cand = cand & ~cull
        # exclusion tile-pair flags: excluded pairs live at original-index
        # offsets 1..31.  EXACT and scatter-free: for each offset d,
        # accumulate the partner-tile one-hot rows shifted by d, masked by
        # "atom o has bit d set" — 31 fused multiply-adds on (n,T) plus
        # one (T,n)x(n,T) matmul on the MXU.  Exactness matters: a
        # conservative 32-bucket variant flagged 98% of candidate tile
        # pairs where the true fraction is 43%, silently disabling the
        # kernel's exclusion-skip fast path on most tiles (~11% of kernel
        # time); the naive 604k-element scatter-max cost ~10 ms of the
        # rebuild.
        t_of = invperm[:n] // ts                               # (n,) i32
        bits_o = jnp.asarray(tables["excl_bits"]).astype(jnp.int32)
        if tables.get("has_exc14", False):
            bits_o = bits_o | jnp.asarray(
                tables["exc14_bits"]).astype(jnp.int32)
        oh_t = (t_of[:, None] == ii[None, :]).astype(jnp.float32)  # (n,T)
        acc = jnp.zeros_like(oh_t)
        for dpos in range(1, MAX_EXCL_OFFSET + 1):
            hasd = ((bits_o >> dpos) & 1).astype(jnp.float32)
            part = jnp.concatenate(
                [oh_t[dpos:], jnp.zeros((dpos, n_tiles), jnp.float32)],
                axis=0)
            acc = acc + hasd[:, None] * part
        excl_mat = jnp.dot(oh_t.T, acc,
                           preferred_element_type=jnp.float32) > 0
        excl_mat = excl_mat | excl_mat.T
        # compact the upper triangle row-major (ascending flat index keeps
        # entries grouped by row tile, so row output blocks are revisited
        # consecutively in the kernel)
        ut = cand & (ii[None, :] >= ii[:, None])
        flat = ut.reshape(-1)
        count = jnp.sum(flat.astype(jnp.int32))
        overflow = count > cap
        idx = jnp.nonzero(flat, size=cap,
                          fill_value=n_tiles * n_tiles)[0].astype(jnp.int32)
        active = idx < n_tiles * n_tiles
        i_t = jnp.where(active, idx // n_tiles, 0)
        j_t = jnp.where(active, idx % n_tiles, 0)
        first = active & jnp.concatenate(
            [jnp.ones((1,), bool), i_t[1:] != i_t[:-1]])
        has_ex = active & (excl_mat[i_t, j_t] | (i_t == j_t))
        flags = (active.astype(jnp.int32)
                 | (has_ex.astype(jnp.int32) << 1)
                 | (first.astype(jnp.int32) << 2))
        # one packed word per entry (see PairCache.plist); 14 bits per tile
        # index caps the kernel at 16,384 tiles (~2M atoms at ts=128)
        assert n_tiles < (1 << 14), "plist packing: too many tiles"
        plist = (i_t << 17) | (j_t << 3) | flags
        if any(nowrap):
            # verify the kernel's first-atom-frame budget on the nowrap
            # axes (see _plist_kernel's _wrap): every nonempty tile's tight
            # extent must fit L/2 - rc_cand - slack.  Violations fold into
            # ``overflow`` (coverage-bad -> fallback + rebuild); the
            # host-side axis choice carries enough margin that this never
            # trips in practice.
            ext = hi - lo                                      # (T,3)
            budget = (0.5 * box_arr - jnp.float32(rc_cand)
                      - NOWRAP_SLACK)
            frame_bad = jnp.zeros((), bool)
            for ax in range(3):
                if not nowrap[ax]:
                    continue
                frame_bad = frame_bad | jnp.any(
                    nonempty & (ext[:, ax] > budget[ax]))
            overflow = overflow | frame_bad
    onehotT = onehot2d[perm].T
    gonehotT = gonehot2d[perm].T
    ab2 = oh2T = None
    if cap > 0:
        # tile-major stacked table rows (see the PairCache.ab2 doc): the
        # plist kernel's whole per-pair coefficient selection — a, b, and
        # the group-allowed mask when present — becomes one MXU dot per
        # tile pair against the stacked one-hot
        t_dim = onehot2d.shape[1]
        n_tiles = n_pad // ts
        av = ab[:, :t_dim]
        bv = ab[:, t_dim:2 * t_dim]
        use_groups = gonehot2d.shape[1] > 1
        if use_groups:
            G = grows.shape[1]
            blocks = [jnp.pad(av, ((0, 0), (0, G))),
                      jnp.pad(bv, ((0, 0), (0, G))),
                      jnp.pad(grows, ((0, 0), (t_dim, 0)))]
            oh2T = jnp.concatenate([onehotT, gonehotT], axis=0)
        else:
            blocks = [av, bv]
            oh2T = onehotT
        k2 = blocks[0].shape[1]
        ab2 = jnp.concatenate(
            [blk.reshape(n_tiles, ts, k2) for blk in blocks],
            axis=1).reshape(len(blocks) * n_pad, k2)
    return PairCache(
        perm=perm, invperm=invperm, q2d=q2d, ab=ab, bits2d=bits2d,
        bits14_2d=bits14_2d,
        grows=grows, qT=q2d.reshape(1, -1), bitsT=bits2d.reshape(1, -1),
        bits14T=bits14_2d.reshape(1, -1),
        oidT=perm.reshape(1, -1), onehotT=onehotT,
        gonehotT=gonehotT,
        plist=plist, cand=cand, overflow=overflow,
        tile_inert=(tile_inert if (cap > 0 and inert is not None)
                    else None),
        ab2=ab2, oh2T=oh2T)


# LJ-table one-hot dots as exact multi-pass bf16 MXU contractions instead
# of one f32 matmul.  A/B-measured on the real chip (TPU v5e, 19.5k-atom
# bench config): bf16 three-pass is SLOWER than the single f32 dot
# (2.276 vs 1.959 ms/step) — Mosaic's own f32 decomposition beats the
# hand-split here because the extra passes defeat operand reuse.  Kept as
# an opt-in flag for future hardware; default off.
MXU_ROW_REDUCE = False  # row-sum the force blocks on the MXU instead of VPU lane reductions
LJ_DOT_BF16 = False


def _onehot_dot(table_f32, onehot, exact_01=False):
    """dot(table, onehot) with the table in f32 and onehot made of 0/1."""
    if not LJ_DOT_BF16:
        return jnp.dot(table_f32, onehot,
                       preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    hi = table_f32.astype(jnp.bfloat16)
    out = jnp.dot(hi, oh, preferred_element_type=jnp.float32)
    if not exact_01:
        # two residue terms bring the reconstruction to ~2^-24 relative —
        # f32-exact for the LJ tables even through the r^-12 amplification
        r1 = table_f32 - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        r2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jnp.dot(lo, oh, preferred_element_type=jnp.float32)
        out = out + jnp.dot(r2, oh, preferred_element_type=jnp.float32)
    return out


def _pair_kernel(pos_rows_ref, q_rows_ref, ab_rows_ref, bits_rows_ref,
                 grows_ref, posT_ref, qT_ref, onehotT_ref, bitsT_ref,
                 gonehotT_ref, box_ref, fout_ref, *, n, n_pad, tm, tn, beta,
                 r_cutoff, t_dim, use_groups, r_switch=0.0):
    i = pl.program_id(0)
    row0 = i * tm
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    bits_rows = bits_rows_ref[:, :]                   # (tm,1) i32
    a_rows = ab_rows_ref[:, :t_dim]                   # (tm,T)
    b_rows = ab_rows_ref[:, t_dim:2 * t_dim]
    px = pos_rows_ref[:, 0:1]
    py = pos_rows_ref[:, 1:2]
    pz = pos_rows_ref[:, 2:3]
    qrow = q_rows_ref[:, :]                           # (tm,1)
    bx = box_ref[0]
    by = box_ref[1]
    bz = box_ref[2]
    n_col_tiles = n_pad // tn

    def body(jt, carry):
        fx, fy, fz, elj, ecoul, ecorr = carry
        col0 = jt * tn
        cpos = posT_ref[:, pl.ds(col0, tn)]                     # (3,tn)
        cx = cpos[0:1, :]
        cy = cpos[1:2, :]
        cz = cpos[2:3, :]
        qcol = qT_ref[:, pl.ds(col0, tn)]                       # (1,tn)
        bits_col = bitsT_ref[:, pl.ds(col0, tn)]                # (1,tn)
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)

        dx = px - cx
        dx = dx - bx * jnp.round(dx * (1.0 / bx))
        dy = py - cy
        dy = dy - by * jnp.round(dy * (1.0 / by))
        dz = pz - cz
        dz = dz - bz * jnp.round(dz * (1.0 / bz))
        r2 = dx * dx + dy * dy + dz * dz

        delta = col_ids - row_ids                               # (tm,tn)
        dfwd = jnp.clip(delta, 1, MAX_EXCL_OFFSET)
        dbwd = jnp.clip(-delta, 1, MAX_EXCL_OFFSET)
        excl = (((bits_rows >> dfwd) & 1) > 0) & (delta >= 1) & \
               (delta <= MAX_EXCL_OFFSET)
        excl |= (((bits_col >> dbwd) & 1) > 0) & (delta <= -1) & \
                (delta >= -MAX_EXCL_OFFSET)
        alive = (delta != 0) & (row_ids < n) & (col_ids < n)

        onehot_c = onehotT_ref[:, pl.ds(col0, tn)]              # (T,tn)
        a = _onehot_dot(a_rows, onehot_c)
        b = _onehot_dot(b_rows, onehot_c)
        if use_groups:
            goh_c = gonehotT_ref[:, pl.ds(col0, tn)]            # (G,tn)
            allowed = _onehot_dot(grows_ref[:, :], goh_c, exact_01=True)
            a = a * allowed
            b = b * allowed
        qq = ONE_4PI_EPS0 * qrow * qcol

        in_range = alive & ~excl & (r2 < r_cutoff * r_cutoff)
        corr = alive & excl
        r2s = jnp.maximum(r2, 1e-10)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        r = r2s * inv_r
        inv_r2_lj = 1.0 / jnp.maximum(r2, 1e-6)
        inv_r6 = inv_r2_lj * inv_r2_lj * inv_r2_lj
        inv_r12 = inv_r6 * inv_r6
        e_lj = a * a * inv_r12 - b * inv_r6
        f_lj = (12.0 * a * a * inv_r12 - 6.0 * b * inv_r6) * inv_r2_lj
        e_lj, f_lj = lj_switch(e_lj, f_lj, r, inv_r, r_switch, r_cutoff)
        br = beta * r
        expm = jnp.exp(-br * br)
        t = 1.0 / (1.0 + 0.3275911 * br)
        erfc_br = (t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                   + t * (-1.453152027 + t * 1.061405429))))) * expm
        gauss = (2.0 * beta / _SQRT_PI) * expm
        e_c = qq * erfc_br * inv_r
        f_c = qq * (erfc_br * inv_r + gauss) * inv_r2
        erf_inv_r = (1.0 - erfc_br) * inv_r
        e_x = -qq * erf_inv_r
        f_x = -qq * (erf_inv_r - gauss) * inv_r2
        zero = jnp.zeros_like(r2)
        f_s = jnp.where(in_range, f_lj + f_c, zero) + \
            jnp.where(corr, f_x, zero)

        fx = fx + jnp.sum(f_s * dx, axis=1, keepdims=True)
        fy = fy + jnp.sum(f_s * dy, axis=1, keepdims=True)
        fz = fz + jnp.sum(f_s * dz, axis=1, keepdims=True)
        elj = elj + jnp.sum(jnp.where(in_range, e_lj, zero), axis=1,
                            keepdims=True)
        ecoul = ecoul + jnp.sum(jnp.where(in_range, e_c, zero), axis=1,
                                keepdims=True)
        ecorr = ecorr + jnp.sum(jnp.where(corr, e_x, zero), axis=1,
                                keepdims=True)
        return fx, fy, fz, elj, ecoul, ecorr

    z = jnp.zeros((tm, 1), jnp.float32)
    fx, fy, fz, elj, ecoul, ecorr = jax.lax.fori_loop(
        0, n_col_tiles, body, (z, z, z, z, z, z))
    fout_ref[:, 0:1] = fx
    fout_ref[:, 1:2] = fy
    fout_ref[:, 2:3] = fz
    fout_ref[:, 3:4] = elj
    fout_ref[:, 4:5] = ecoul
    fout_ref[:, 5:6] = ecorr
    fout_ref[:, 6:8] = jnp.zeros((tm, 2), jnp.float32)


def _pair_tri_kernel(pos_rows_ref, q_rows_ref, ab_rows_ref, bits_rows_ref,
                     bits14_rows_ref, oid_rows_ref, grows_ref, posT_ref,
                     qT_ref, onehotT_ref, bitsT_ref, bits14T_ref, oidT_ref,
                     gonehotT_ref, box_ref, row_off_ref, rows_ref,
                     colacc_ref, *, n, ts, beta, r_cutoff, t_dim, use_groups,
                     mode, want_energy, has14, pcoef, full_sweep=False,
                     n_tiles_g=0, r_switch=0.0):
    """Upper-triangle tile sweep: Newton's third law halves the pair work.

    TPU grid execution is sequential, so output blocks revisited across the
    inner grid axis accumulate in VMEM, and the full-length column
    accumulator (constant index map) collects -f across all programs.

    Three specializations:
    mode="band"    grid (n_tiles, 2), j = i + pid(1): diagonal + first
                   off-diagonal tiles with the exclusion bitmask tested
                   against index *positions* (iota) and the
                   -qq erf(beta r)/r correction (exclusions only reach
                   |delta| <= 31 < ts in original atom order);
    mode="far"     grid (n_tiles, n_tiles), tiles with j >= i + 2: lean pair
                   math only — no integer ops, no correction path;
    mode="bandall" the z-banded sorted sweep (rows pre-sorted by wrapped z,
                   see direct_space_pallas): grid (n_tiles, W+1) with the
                   column tile wrapping, j = (i + pid(1)) % n_tiles — tile
                   pairs farther than W in circular z order are provably
                   beyond the cutoff and never touched.  Exclusions are
                   tested against the carried ORIGINAL atom indices
                   (oid_rows/oidT), since sorting scrambles positions but
                   excluded pairs stay spatially (hence z-) close.  Requires
                   n_tiles >= 2W+1 so every unordered tile pair is visited
                   exactly once.  With full_sweep=True the same enumeration
                   covers EVERY unordered tile pair (W = n_tiles//2, plus a
                   dedup guard for even n_tiles where the i+W offset would
                   visit each pair twice) — the in-step fallback when the
                   band is too narrow for the current configuration.

    Padding atoms are zero-charge / zero-LJ rows, so their contributions
    vanish identically (LJ uses the (a/r^6)^2 form, which keeps 0 * inf out
    of the arithmetic even for coincident pads); only self-pairs
    (delta == 0) need masking.

    want_energy=False skips the three per-tile energy reductions (the MD
    step only consumes forces; energies are a separate query path).
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    band = mode == "band"
    bandall = mode == "bandall"
    test_excl = band or bandall
    if bandall:
        # global row tile index: under a row-sharded mesh each shard sweeps
        # a local grid; row_off (SMEM scalar) shifts into the global tile
        # numbering and n_tiles_g is the GLOBAL tile count (the column
        # tables are full-length on every shard)
        ntg = n_tiles_g if n_tiles_g else n_tiles
        gi = i + row_off_ref[0]
        j = jax.lax.rem(gi + pl.program_id(1), ntg)
        if full_sweep and ntg % 2 == 0:
            # offset ntg//2 enumerates each unordered pair twice
            active = jnp.logical_or(2 * pl.program_id(1) != ntg, gi < j)
        else:
            active = jnp.bool_(True)
        first = pl.program_id(1) == 0
    elif band:
        j = i + pl.program_id(1)
        active = j < n_tiles
        first = pl.program_id(1) == 0
    else:
        j = pl.program_id(1)
        active = j >= i + 2
        first = j == 0

    diag = (gi == j) if bandall else (i == j)

    @pl.when(jnp.logical_and(i == 0, pl.program_id(1) == 0))
    def _init_colacc():
        colacc_ref[:, :] = jnp.zeros_like(colacc_ref)

    @pl.when(first)
    def _init_rows():
        rows_ref[:, :] = jnp.zeros_like(rows_ref)

    @pl.when(active)
    def _compute():
        row0 = i * ts
        col0 = j * ts
        row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
        a_rows = ab_rows_ref[:, :t_dim]
        b_rows = ab_rows_ref[:, t_dim:2 * t_dim]
        px = pos_rows_ref[:, 0:1]
        py = pos_rows_ref[:, 1:2]
        pz = pos_rows_ref[:, 2:3]
        qrow = q_rows_ref[:, :]
        bx = box_ref[0]
        by = box_ref[1]
        bz = box_ref[2]

        cpos = posT_ref[:, pl.ds(col0, ts)]
        cx = cpos[0:1, :]
        cy = cpos[1:2, :]
        cz = cpos[2:3, :]
        qcol = qT_ref[:, pl.ds(col0, ts)]

        dx = px - cx
        dx = dx - bx * jnp.round(dx * (1.0 / bx))
        dy = py - cy
        dy = dy - by * jnp.round(dy * (1.0 / by))
        dz = pz - cz
        dz = dz - bz * jnp.round(dz * (1.0 / bz))
        r2 = dx * dx + dy * dy + dz * dz

        # pads are zero-charge/zero-LJ, so only SELF pairs need masking;
        # the row_ids/col_ids < n tests are unnecessary (see module doc)
        if test_excl:
            if bandall:
                # sorted order: exclusion offsets live in ORIGINAL indices
                delta = oidT_ref[:, pl.ds(col0, ts)] - oid_rows_ref[:, :]
            else:
                delta = col_ids - row_ids
            # masks are recorded at the LOWER original index: select that
            # side's bits by the sign of delta, test |delta| (one select +
            # one shift; see the plist kernel)
            side = delta >= 0
            dabs = jnp.abs(delta)
            dsh = jnp.minimum(dabs, MAX_EXCL_OFFSET)
            window = dabs <= MAX_EXCL_OFFSET
            alive = delta != 0
            bits_lo = jnp.where(side, bits_rows_ref[:, :],
                                bitsT_ref[:, pl.ds(col0, ts)])
            excl = (((bits_lo >> dsh) & 1) > 0) & window & alive
            if has14:
                b14_lo = jnp.where(side, bits14_rows_ref[:, :],
                                   bits14T_ref[:, pl.ds(col0, ts)])
                is14 = (((b14_lo >> dsh) & 1) > 0) & window & alive

        onehot_c = onehotT_ref[:, pl.ds(col0, ts)]
        a = _onehot_dot(a_rows, onehot_c)
        b = _onehot_dot(b_rows, onehot_c)
        if use_groups:
            goh_c = gonehotT_ref[:, pl.ds(col0, ts)]
            allowed = _onehot_dot(grows_ref[:, :], goh_c, exact_01=True)
            a = a * allowed
            b = b * allowed
        qq = ONE_4PI_EPS0 * qrow * qcol

        r2s = jnp.maximum(r2, 1e-10)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        inv_r2_lj = jnp.minimum(inv_r2, 1e6)
        inv_r6 = inv_r2_lj * inv_r2_lj * inv_r2_lj
        # (a/r^6)^2 instead of a^2/r^12: keeps coincident zero-LJ pairs
        # (pads, image charges at t=0) at 0 * finite instead of 0 * inf
        alj = a * inv_r6
        a12 = alj * alj
        b6 = b * inv_r6
        e_lj = a12 - b6
        f_lj = (12.0 * a12 - 6.0 * b6) * inv_r2_lj
        e_lj, f_lj = lj_switch(e_lj, f_lj, r2s * inv_r, inv_r, r_switch,
                               r_cutoff)
        zero = jnp.zeros_like(r2)
        if want_energy:
            # exact erfc path (energy queries only; A&S 7.1.26)
            r = r2s * inv_r
            br = beta * r
            expm = jnp.exp(-br * br)
            t = 1.0 / (1.0 + 0.3275911 * br)
            erfc_br = (t * (0.254829592 + t * (-0.284496736
                       + t * (1.421413741 + t * (-1.453152027
                       + t * 1.061405429))))) * expm
            gauss = (2.0 * beta / _SQRT_PI) * expm
            e_c = qq * erfc_br * inv_r
            erf_inv_r = (1.0 - erfc_br) * inv_r
            f_x = -qq * (erf_inv_r - gauss) * inv_r2
            # same cap form as the poly path and the dense kernel: capped
            # bare 1/r^3 + finite remainder (allpairs._COUL_CAP_R contract)
            f_c = qq * jnp.minimum(inv_r * inv_r2, 1.0 / 0.045 ** 3) + f_x
        else:
            # poly force path: no exp, no div, no erfc (see _pfit /
            # _pfit_scaled — beta is folded into the coefficients); the
            # bare-Coulomb 1/r^3 is capped per the shared cap contract
            # documented at allpairs._COUL_CAP_R (excluded pairs take f_x,
            # finite at r -> 0)
            pp = jnp.float32(pcoef[-1])
            for cof in pcoef[-2::-1]:
                pp = pp * r2s + jnp.float32(cof)
            w = qq * pp
            f_c = qq * jnp.minimum(inv_r * inv_r2, 1.0 / 0.045 ** 3) + w
            f_x = w
        if test_excl:
            in_range = alive & ~excl & (r2 < r_cutoff * r_cutoff)
            corr = alive & excl
            f_s = jnp.where(in_range, f_lj + f_c, zero) + \
                jnp.where(corr, f_x, zero)
            if has14:
                pair14 = alive & is14
                a14 = _onehot_dot(ab_rows_ref[:, 2 * t_dim:3 * t_dim],
                                  onehot_c)
                b14 = _onehot_dot(ab_rows_ref[:, 3 * t_dim:], onehot_c)
                e14_c = 0.5 * qq * inv_r
                a14lj = a14 * inv_r6
                e14_12 = a14lj * a14lj
                e14_6 = b14 * inv_r6
                f14 = (e14_c + 12.0 * e14_12 - 6.0 * e14_6) * inv_r2
                f_s = f_s + jnp.where(pair14, f14, zero)
                e14_c_m = jnp.where(pair14, e14_c, zero)
                e14_l_m = jnp.where(pair14, e14_12 - e14_6, zero)
        else:
            # far tiles: j >= i + 2, so delta != 0 by construction and pads
            # self-cancel — the only mask is the cutoff itself
            in_range = r2 < r_cutoff * r_cutoff
            f_s = jnp.where(in_range, f_lj + f_c, zero)

        fx = jnp.sum(f_s * dx, axis=1, keepdims=True)
        fy = jnp.sum(f_s * dy, axis=1, keepdims=True)
        fz = jnp.sum(f_s * dz, axis=1, keepdims=True)
        if want_energy:
            half = jnp.where(diag, 0.5, 1.0) if test_excl else 1.0
            if test_excl:
                e_x = -qq * erf_inv_r
                ecorr = half * jnp.sum(jnp.where(corr, e_x, zero), axis=1,
                                       keepdims=True)
            else:
                ecorr = jnp.zeros((ts, 1), jnp.float32)
            elj = half * jnp.sum(jnp.where(in_range, e_lj, zero), axis=1,
                                 keepdims=True)
            ecoul = half * jnp.sum(jnp.where(in_range, e_c, zero), axis=1,
                                   keepdims=True)
        else:
            elj = ecoul = ecorr = jnp.zeros((ts, 1), jnp.float32)
        if want_energy and test_excl and has14:
            half14 = jnp.where(diag, 0.5, 1.0)
            e14c_s = half14 * jnp.sum(e14_c_m, axis=1, keepdims=True)
            e14l_s = half14 * jnp.sum(e14_l_m, axis=1, keepdims=True)
        else:
            e14c_s = e14l_s = jnp.zeros((ts, 1), jnp.float32)
        block = jnp.concatenate(
            [fx, fy, fz, elj, ecoul, ecorr, e14c_s, e14l_s], axis=1)
        rows_ref[:, :] = rows_ref[:, :] + block

        @pl.when(jnp.logical_not(jnp.logical_and(test_excl, diag)))
        def _acc_cols():
            # column-side reaction forces (Newton's third law)
            gx = -jnp.sum(f_s * dx, axis=0, keepdims=True)       # (1,ts)
            gy = -jnp.sum(f_s * dy, axis=0, keepdims=True)
            gz = -jnp.sum(f_s * dz, axis=0, keepdims=True)
            cur = colacc_ref[:, pl.ds(col0, ts)]
            upd = jnp.concatenate(
                [gx, gy, gz, jnp.zeros((5, ts), jnp.float32)], axis=0)
            colacc_ref[:, pl.ds(col0, ts)] = cur + upd


def _tri_call(mode, grid, pos2d, q2d, ab, bits2d, bits14_2d, oid2d, grows,
              posT, qT, onehotT, bitsT, bits14T, oidT, gonehotT, box, beta,
              r_cutoff, ts, n_real, t_dim, has14, interpret,
              want_energy=True, full_sweep=False, row_off=None,
              n_tiles_g=0, r_switch=0.0):
    n_pad = posT.shape[1]
    t2 = ab.shape[1]
    use_groups = gonehotT.shape[0] > 1
    kernel = functools.partial(
        _pair_tri_kernel, n=n_real, ts=ts, beta=beta, r_cutoff=r_cutoff,
        t_dim=t_dim, use_groups=use_groups, mode=mode,
        want_energy=want_energy, has14=has14,
        pcoef=_pfit_scaled(float(beta), float(r_cutoff)), full_sweep=full_sweep,
        n_tiles_g=n_tiles_g, r_switch=r_switch)
    if row_off is None:
        row_off = jnp.zeros((1,), jnp.int32)
    else:
        row_off = jnp.asarray(row_off, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, t2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, grows.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0] * ts, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ),
        interpret=interpret,
        # the 1-4 exception path raises simultaneous (ts,ts) liveness past
        # the default 16 MB scoped-vmem limit; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(pos2d, q2d, ab, bits2d, bits14_2d, oid2d, grows, posT, qT, onehotT,
      bitsT, bits14T, oidT, gonehotT, box, row_off)


@functools.partial(jax.jit,
                   static_argnames=("beta", "r_cutoff", "ts", "n_real",
                                    "band_w", "t_dim", "has14",
                                    "want_energy", "interpret", "full_sweep",
                                    "r_switch"))
def _run_tri(pos2d, q2d, ab, bits2d, bits14_2d, oid2d, grows, posT, qT,
             onehotT, bitsT, bits14T, oidT, gonehotT, box, beta, r_cutoff,
             ts, n_real, t_dim, has14, band_w=0,
             want_energy=True, interpret=False, full_sweep=False,
             r_switch=0.0):
    n_pad = posT.shape[1]
    n_tiles = n_pad // ts
    banded = band_eligible(n_pad, ts, band_w)
    args = (pos2d, q2d, ab, bits2d, bits14_2d, oid2d, grows, posT, qT,
            onehotT, bitsT, bits14T, oidT, gonehotT, box, beta, r_cutoff,
            ts, n_real, t_dim, has14, interpret)
    kw_switch = dict(r_switch=r_switch)
    if full_sweep:
        # sorted-layout sweep over EVERY unordered tile pair (the fallback
        # branch when the band is too narrow for the current configuration)
        w_full = n_tiles // 2
        return _tri_call("bandall", (n_tiles, w_full + 1), *args,
                         want_energy=want_energy, full_sweep=True,
                         **kw_switch)
    if banded:
        return _tri_call("bandall", (n_tiles, band_w + 1), *args,
                         want_energy=want_energy, **kw_switch)
    rows_b, col_b = _tri_call("band", (n_tiles, min(2, n_tiles)), *args,
                              want_energy=want_energy, **kw_switch)
    if n_tiles > 2:
        rows_f, col_f = _tri_call("far", (n_tiles, n_tiles), *args,
                                  want_energy=want_energy, **kw_switch)
        rows_b = rows_b + rows_f
        col_b = col_b + col_f
    return rows_b, col_b


def band_eligible(n_pad: int, ts: int, band_w: int) -> bool:
    """True when the banded enumeration covers every unordered tile pair
    exactly once (same predicate _run_tri uses)."""
    n_tiles = n_pad // ts
    return band_w >= 1 and n_tiles >= 2 * band_w + 1 and n_tiles >= 3


def band_coverage_bad(pos, box, cache: PairCache, ts: int, band_w: int,
                      r_cutoff: float):
    """True (device bool) when the banded sweep would MISS an interacting
    pair for the CURRENT positions under the cached sort: some uncovered
    tile pair's circular z-interval gap falls within the cutoff.

    Exact even when the cached sort is stale — drift only widens the tile
    z-intervals it tests.  Intervals are built around each tile's CIRCULAR
    mean so atoms that wrapped across the z boundary since the sort don't
    blow a linear [min,max] up to the whole box.  Callers use this both to
    trigger an in-step cache rebuild and to select the full-sweep fallback
    branch when even a fresh sort cannot be covered by band_w (density
    drift under NPT, slab migration during EDL charging)."""
    n = pos.shape[0]
    n_pad = cache.perm.shape[0]
    pad = n_pad - n
    n_tiles = n_pad // ts
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    lz = box_arr[2]
    zw = pos[:, 2] - lz * jnp.floor(pos[:, 2] / lz)
    keys = jnp.concatenate([zw.astype(jnp.float32),
                            jnp.full((pad,), 1e30, jnp.float32)])
    skeys = keys[cache.perm].reshape(n_tiles, ts)
    valid = (cache.perm < n).reshape(n_tiles, ts)
    nonempty = valid.any(axis=1)
    two_pi = jnp.float32(2.0 * np.pi)
    theta = skeys * (two_pi / lz)
    sn = jnp.sum(jnp.where(valid, jnp.sin(theta), 0.0), axis=1)
    cs = jnp.sum(jnp.where(valid, jnp.cos(theta), 0.0), axis=1)
    cmean = jnp.arctan2(sn, cs) * (lz / two_pi)                # (n_tiles,)
    dev = jnp.mod(skeys - cmean[:, None] + 0.5 * lz, lz) - 0.5 * lz
    lo = jnp.min(jnp.where(valid, dev, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(valid, dev, -jnp.inf), axis=1)
    width_bad = (hi - lo) > 0.5 * lz                           # degenerate
    delta = jnp.mod(cmean[None, :] - cmean[:, None] + 0.5 * lz,
                    lz) - 0.5 * lz                              # signed j-i
    gap = jnp.where(delta >= 0,
                    delta - hi[:, None] + lo[None, :],
                    -delta - hi[None, :] + lo[:, None])
    # the band ring spans only the tiles holding real atoms (pads sort
    # last; tile_multiple padding for the row-sharded sweep appends whole
    # pad tiles) — wrap offsets must use the REAL ring modulus
    n_ring = (n + ts - 1) // ts
    off = (np.arange(n_tiles)[None, :]
           - np.arange(n_tiles)[:, None]) % n_ring
    covered = np.minimum(off, n_ring - off) <= band_w
    bad = (~covered) & ((gap <= r_cutoff) | width_bad[:, None]
                        | width_bad[None, :]) \
        & nonempty[:, None] & nonempty[None, :]
    return bad.any()


def plist_coverage_bad(pos_sorted, box, cache: PairCache, ts: int,
                       r_cutoff: float, nowrap=(False, False, False)):
    """True (device bool) when the tile-pair-list sweep would MISS an
    interacting pair for CURRENT positions: some non-candidate tile pair's
    circular AABBs (recomputed now, under the cached permutation) come
    within the cutoff.  Exact regardless of drift — moving atoms only
    widen the intervals tested.  Also trips on build-time list overflow,
    and — when the kernel runs with nowrap axes — on any tile whose
    CURRENT tight extent outgrows the first-atom-frame budget
    (L/2 - rc - NOWRAP_SLACK; the build used the tighter rc_cand form, so
    a trip here means real drift, caught a full slack margin before the
    frame could actually go stale)."""
    n_pad = cache.perm.shape[0]
    n_tiles = n_pad // ts
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    # pad slots carry sentinel positions (1e6) — that marks them invalid
    # without needing n in the cache
    valid = pos_sorted[:, 0] < 1e5
    cmean, lo, hi, nonempty = _tile_intervals(pos_sorted, valid, box_arr, ts)
    d2 = _tile_pair_dist2(cmean, lo, hi, box_arr)
    pair_ok = nonempty[:, None] & nonempty[None, :]
    if cache.tile_inert is not None:
        # inert-inert pairs are deliberately absent from the force path's
        # list (PairCache.tile_inert) — not a coverage miss
        pair_ok = pair_ok & ~(cache.tile_inert[:, None]
                              & cache.tile_inert[None, :])
    bad = (~cache.cand) & pair_ok & (d2 <= jnp.float32(r_cutoff) ** 2)
    out = bad.any() | cache.overflow
    if any(nowrap):
        ext = hi - lo                                           # (T,3)
        budget = (0.5 * box_arr - jnp.float32(r_cutoff)
                  - NOWRAP_SLACK)
        for ax in range(3):
            if not nowrap[ax]:
                continue
            out = out | jnp.any(nonempty & (ext[:, ax] > budget[ax]))
    return out


def _tile_intervals_np(pos, box, ts, mode):
    """Host-side (numpy) mirror of the sort + _tile_intervals chain:
    returns (cmean, lo, hi, nonempty, order) with lo/hi relative to cmean."""
    n = pos.shape[0]
    n_pad = ((n + ts - 1) // ts) * ts
    n_tiles = n_pad // ts
    w = pos - box * np.floor(pos / box)
    if mode == "z":
        order = np.argsort(w[:, 2], kind="stable")
    else:
        cell = np.clip((w / box * 64.0).astype(np.int64), 0, 63)

        def spread(x):
            out = np.zeros_like(x)
            for b in range(6):
                out |= ((x >> b) & 1) << (3 * b)
            return out

        key = spread(cell[:, 0]) | (spread(cell[:, 1]) << 1) | \
            (spread(cell[:, 2]) << 2)
        order = np.argsort(key, kind="stable")
    ws = np.full((n_pad, 3), np.nan)
    ws[:n] = w[order]
    ws = ws.reshape(n_tiles, ts, 3)
    valid = ~np.isnan(ws[:, :, 0])
    v = valid[:, :, None]
    w2 = ws - np.where(ws >= 0.5 * box, box, 0.0)
    lo1 = np.nanmin(np.where(v, ws, np.inf), axis=1)
    hi1 = np.nanmax(np.where(v, ws, -np.inf), axis=1)
    lo2 = np.nanmin(np.where(v, w2, np.inf), axis=1)
    hi2 = np.nanmax(np.where(v, w2, -np.inf), axis=1)
    use2 = (hi2 - lo2) < (hi1 - lo1)
    lo_w = np.where(use2, lo2, lo1)
    hi_w = np.where(use2, hi2, hi1)
    cmean = 0.5 * (lo_w + hi_w)
    nonempty = valid.any(axis=1)
    lo = np.where(nonempty[:, None], lo_w - cmean, 0.0)
    hi = np.where(nonempty[:, None], hi_w - cmean, 0.0)
    cmean = np.where(nonempty[:, None], cmean, 0.0)
    return cmean, lo, hi, nonempty, order


def nowrap_axes_np(pos, box, ts: int, rc_cand: float,
                   mode: str = "morton"):
    """Host-side choice of the plist kernel's first-atom-frame ("nowrap")
    axes for THIS configuration snapshot (see _plist_kernel's _wrap): an
    axis qualifies when the widest tile extent fits the budget
    L/2 - rc_cand - 2*NOWRAP_SLACK.  Double the build-time slack so
    post-init drift cannot flip the runtime checks; the per-step coverage
    check still re-verifies against current positions."""
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64).reshape(3)
    _, lo, hi, nonempty, _ = _tile_intervals_np(pos, box, ts, mode)
    ext = (hi - lo)[nonempty]
    if ext.shape[0] == 0:
        return (False, False, False)
    budget = 0.5 * box - rc_cand - 2.0 * NOWRAP_SLACK
    return tuple(bool(ext[:, ax].max() <= budget[ax])
                 for ax in range(3))


def count_candidates_np(pos, box, ts: int, rc_cand: float,
                        mode: str = "morton", inert=None) -> int:
    """Host-side (numpy) mirror of the AABB candidate enumeration under
    the chosen sort key: the exact candidate tile-pair count for THIS
    configuration.  Used to size the pair-list capacity at evaluator build
    (cap = margin x count) and to pick the better sort key; the runtime
    overflow flag + full-sweep fallback guard the margin."""
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64).reshape(3)
    n = pos.shape[0]
    n_pad = ((n + ts - 1) // ts) * ts
    n_tiles = n_pad // ts
    cmean, lo, hi, nonempty, order = _tile_intervals_np(pos, box, ts, mode)
    delta = np.mod(cmean[None, :, :] - cmean[:, None, :] + 0.5 * box,
                   box) - 0.5 * box
    gap = np.where(delta >= 0,
                   delta - hi[:, None, :] + lo[None, :, :],
                   -delta - hi[None, :, :] + lo[:, None, :])
    wide = (hi - lo) > 0.5 * box
    gap = np.where(wide[:, None, :] | wide[None, :, :], 0.0, gap)
    gap = np.maximum(gap, 0.0)
    d2 = np.sum(gap * gap, axis=-1)
    cand = (d2 <= rc_cand ** 2) & nonempty[:, None] & nonempty[None, :]
    cand |= np.eye(n_tiles, dtype=bool) & nonempty[:, None]
    if inert is not None:
        # mirror make_pair_cache's inert-inert cull so the capacity (and
        # hence the kernel grid) shrinks with it
        ip = np.ones(n_pad, bool)
        ip[:n] = np.asarray(inert, bool)[order]
        ti = ip.reshape(n_tiles, ts).all(axis=1)
        cand &= ~(ti[:, None] & ti[None, :]
                  & ~np.eye(n_tiles, dtype=bool))
    ii = np.arange(n_tiles)
    return int(np.sum(cand & (ii[None, :] >= ii[:, None])))


def _plist_kernel(plist_ref, pos_rows_ref, q_rows_ref,
                  ab2_rows_ref, bits_rows_ref, oid_rows_ref, posT_ref,
                  qT_ref, oh2T_ref, bitsT_ref, oidT_ref, box_ref,
                  rows_ref, colacc_ref, *, ts, beta, r_cutoff,
                  use_groups, want_energy, pcoef, r_switch=0.0,
                  nowrap=(False, False, False)):
    """AABB-culled tile-pair-list sweep (mode="plist" of the sorted-layout
    family; see _pair_tri_kernel for the shared math and layout doc).

    The grid is one program per candidate tile pair, scalar-prefetched from
    the cache's plist; entries are grouped by row tile so the row output
    block accumulates in VMEM across consecutive programs.  Pad entries
    (beyond the candidate count) target a trash output tile and skip
    compute.  Tile pairs whose flag says "no excluded pairs here" skip the
    exclusion integer ops entirely — on Morton-sorted production systems
    that is most of them (exclusions are intra-molecular, hence spatially
    local)."""
    p = pl.program_id(0)
    word = plist_ref[p]
    gi = word >> 17
    j = (word >> 3) & 0x3FFF
    flags = word & 7
    active = (flags & 1) != 0
    has_ex = (flags & 2) != 0
    first = (flags & 4) != 0
    diag = gi == j

    @pl.when(p == 0)
    def _init_colacc():
        colacc_ref[:, :] = jnp.zeros_like(colacc_ref)

    @pl.when(first)
    def _init_rows():
        rows_ref[:, :] = jnp.zeros_like(rows_ref)

    def _body(test_excl):
        col0 = j * ts
        px = pos_rows_ref[:, 0:1]
        py = pos_rows_ref[:, 1:2]
        pz = pos_rows_ref[:, 2:3]
        qrow = q_rows_ref[:, :]
        bx = box_ref[0]
        by = box_ref[1]
        bz = box_ref[2]
        cpos = posT_ref[:, pl.ds(col0, ts)]
        cx = cpos[0:1, :]
        cy = cpos[1:2, :]
        cz = cpos[2:3, :]
        qcol = qT_ref[:, pl.ds(col0, ts)]

        # minimum image: on a "nowrap" axis, wrap the row (ts,1) and column
        # (1,ts) positions into the frame centered on the row tile's FIRST
        # atom, then subtract plainly — exact whenever the row tile's tight
        # extent fits L/2 - rc (verified at cache build and re-verified per
        # step by plist_coverage_bad): a wrong-image pair then sits beyond
        # the cutoff under BOTH the computed and the true metric.  This
        # replaces the per-pair round-wrap chain (4 VPU ops on (ts,ts)
        # data) with 8 ops on (ts,1)/(1,ts) data — ~1/ts the work — and is
        # insensitive to raw (unwrapped) coordinates, unlike any
        # precomputed per-tile-pair shift.
        def _wrap(pa, ca, ba, ax):
            if nowrap[ax]:
                c0 = pa[0:1, 0:1]
                paf = pa - ba * jnp.round((pa - c0) * (1.0 / ba))
                caf = ca - ba * jnp.round((ca - c0) * (1.0 / ba))
                return paf - caf
            da = pa - ca
            return da - ba * jnp.round(da * (1.0 / ba))

        dx = _wrap(px, cx, bx, 0)
        dy = _wrap(py, cy, by, 1)
        dz = _wrap(pz, cz, bz, 2)
        r2 = dx * dx + dy * dy + dz * dz

        if test_excl:
            # an exclusion (oid_lo, oid_lo + d), d in 1..31, is recorded at
            # the LOWER original index, so exactly one side's bitmask can
            # hold the pair: select it by the sign of delta and test |delta|
            # — one select + one shift instead of the two-directional
            # clip/shift/mask chain
            delta = oidT_ref[:, pl.ds(col0, ts)] - oid_rows_ref[:, :]
            bits_lo = jnp.where(delta >= 0, bits_rows_ref[:, :],
                                bitsT_ref[:, pl.ds(col0, ts)])
            dabs = jnp.abs(delta)
            dsh = jnp.minimum(dabs, MAX_EXCL_OFFSET)
            excl = (((bits_lo >> dsh) & 1) > 0) & (dabs <= MAX_EXCL_OFFSET)
            alive = delta != 0
            excl &= alive

        # one stacked MXU dot selects a, b (and the group mask) — see
        # PairCache.ab2
        sel = _onehot_dot(ab2_rows_ref[:, :], oh2T_ref[:, pl.ds(col0, ts)])
        a = sel[:ts, :]
        b = sel[ts:2 * ts, :]
        if use_groups:
            allowed = sel[2 * ts:, :]
            a = a * allowed
            b = b * allowed
        qq = ONE_4PI_EPS0 * qrow * qcol

        r2s = jnp.maximum(r2, 1e-10)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        inv_r2_lj = jnp.minimum(inv_r2, 1e6)
        inv_r6 = inv_r2_lj * inv_r2_lj * inv_r2_lj
        alj = a * inv_r6
        a12 = alj * alj
        b6 = b * inv_r6
        e_lj = a12 - b6
        f_lj = (12.0 * a12 - 6.0 * b6) * inv_r2_lj
        e_lj, f_lj = lj_switch(e_lj, f_lj, r2s * inv_r, inv_r, r_switch,
                               r_cutoff)
        zero = jnp.zeros_like(r2)
        if want_energy:
            r = r2s * inv_r
            br = beta * r
            expm = jnp.exp(-br * br)
            t = 1.0 / (1.0 + 0.3275911 * br)
            erfc_br = (t * (0.254829592 + t * (-0.284496736
                       + t * (1.421413741 + t * (-1.453152027
                       + t * 1.061405429))))) * expm
            gauss = (2.0 * beta / _SQRT_PI) * expm
            e_c = qq * erfc_br * inv_r
            erf_inv_r = (1.0 - erfc_br) * inv_r
            f_x = -qq * (erf_inv_r - gauss) * inv_r2
            # same cap form as the poly path and the dense kernel: capped
            # bare 1/r^3 + finite remainder (allpairs._COUL_CAP_R contract)
            f_c = qq * jnp.minimum(inv_r * inv_r2, 1.0 / 0.045 ** 3) + f_x
        else:
            pp = jnp.float32(pcoef[-1])
            for cof in pcoef[-2::-1]:
                pp = pp * r2s + jnp.float32(cof)
            w = qq * pp
            f_c = qq * jnp.minimum(inv_r * inv_r2, 1.0 / 0.045 ** 3) + w
            f_x = w
        if test_excl:
            in_range = alive & ~excl & (r2 < r_cutoff * r_cutoff)
            corr = alive & excl
            f_s = jnp.where(in_range, f_lj + f_c, zero) + \
                jnp.where(corr, f_x, zero)
        else:
            in_range = r2 < r_cutoff * r_cutoff
            f_s = jnp.where(in_range, f_lj + f_c, zero)

        fdx = f_s * dx
        fdy = f_s * dy
        fdz = f_s * dz
        if MXU_ROW_REDUCE:
            # row (lane-axis) reductions as one MXU matvec: the VPU's
            # cross-lane reduction of three (ts, ts) blocks is the pricier
            # form; a (3ts, ts) x (ts, 1) dot does it in one MXU pass
            stack = jnp.concatenate([fdx, fdy, fdz], axis=0)
            rsum = jnp.dot(stack, jnp.ones((ts, 1), jnp.float32),
                           preferred_element_type=jnp.float32)
            fx = rsum[:ts]
            fy = rsum[ts:2 * ts]
            fz = rsum[2 * ts:]
        else:
            fx = jnp.sum(fdx, axis=1, keepdims=True)
            fy = jnp.sum(fdy, axis=1, keepdims=True)
            fz = jnp.sum(fdz, axis=1, keepdims=True)
        if want_energy:
            half = jnp.where(diag, 0.5, 1.0)
            if test_excl:
                e_x = -qq * erf_inv_r
                ecorr = half * jnp.sum(jnp.where(corr, e_x, zero), axis=1,
                                       keepdims=True)
            else:
                ecorr = jnp.zeros((ts, 1), jnp.float32)
            elj = half * jnp.sum(jnp.where(in_range, e_lj, zero), axis=1,
                                 keepdims=True)
            ecoul = half * jnp.sum(jnp.where(in_range, e_c, zero), axis=1,
                                   keepdims=True)
        else:
            elj = ecoul = ecorr = jnp.zeros((ts, 1), jnp.float32)
        pad2 = jnp.zeros((ts, 2), jnp.float32)
        block = jnp.concatenate(
            [fx, fy, fz, elj, ecoul, ecorr, pad2], axis=1)
        rows_ref[:, :] = rows_ref[:, :] + block

        @pl.when(jnp.logical_not(diag))
        def _acc_cols():
            gx = -jnp.sum(fdx, axis=0, keepdims=True)
            gy = -jnp.sum(fdy, axis=0, keepdims=True)
            gz = -jnp.sum(fdz, axis=0, keepdims=True)
            cur = colacc_ref[:, pl.ds(col0, ts)]
            upd = jnp.concatenate(
                [gx, gy, gz, jnp.zeros((5, ts), jnp.float32)], axis=0)
            colacc_ref[:, pl.ds(col0, ts)] = cur + upd

    if want_energy:
        # energy queries are rare: keep one fully-masked specialization
        @pl.when(active)
        def _all():
            _body(True)
    else:
        @pl.when(active & has_ex)
        def _excl_tiles():
            _body(True)

        @pl.when(active & jnp.logical_not(has_ex))
        def _plain_tiles():
            _body(False)


@functools.partial(jax.jit,
                   static_argnames=("beta", "r_cutoff", "ts", "n_real",
                                    "want_energy", "interpret",
                                    "r_switch", "nowrap"))
def _run_plist(plist, pos2d, q2d, ab2, bits2d, oid2d, posT, qT,
               oh2T, bitsT, oidT, box, beta, r_cutoff, ts,
               n_real, want_energy=False, interpret=False,
               r_switch=0.0, nowrap=(False, False, False)):
    n_pad = posT.shape[1]
    n_tiles = n_pad // ts
    cap = plist.shape[0]
    # ab2 stacks S = 2 blocks per tile (A, B) or 3 (A, B, group rows)
    stack = ab2.shape[0] // n_pad
    use_groups = stack == 3
    kernel = functools.partial(
        _plist_kernel, ts=ts, beta=beta, r_cutoff=r_cutoff,
        use_groups=use_groups, want_energy=want_energy,
        pcoef=_pfit_scaled(float(beta), float(r_cutoff)), r_switch=r_switch,
        nowrap=nowrap)
    def _row(p, pref):
        return (pref[p] >> 17, 0)

    def _out_row(p, pref):
        # pad entries (active bit clear) park on the trash tile n_tiles
        return (jnp.where((pref[p] & 1) == 1, pref[p] >> 17, n_tiles),
                0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((ts, 3), _row),
            pl.BlockSpec((ts, 1), _row),
            pl.BlockSpec((stack * ts, ab2.shape[1]), _row),
            pl.BlockSpec((ts, 1), _row),
            pl.BlockSpec((ts, 1), _row),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, 8), _out_row),
            pl.BlockSpec((8, n_pad), lambda p, pref: (0, 0)),
        ),
    )
    rows, colacc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(((n_tiles + 1) * ts, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(plist, pos2d, q2d, ab2, bits2d, oid2d, posT, qT, oh2T,
      bitsT, oidT, box)
    # drop the trash tile pad entries target
    return rows[:n_tiles * ts], colacc


@functools.partial(jax.jit,
                   static_argnames=("beta", "r_cutoff", "tm", "tn", "n_real",
                                    "interpret", "r_switch"))
def _run(pos2d, q2d, ab, bits2d, grows, posT, qT, onehotT, bitsT, gonehotT,
         box, beta, r_cutoff, tm, tn, n_real, interpret=False,
         r_switch=0.0):
    n_pad = posT.shape[1]
    t2 = ab.shape[1]
    use_groups = gonehotT.shape[0] > 1
    n_tiles = n_pad // tm
    kernel = functools.partial(
        _pair_kernel, n=n_real, n_pad=n_pad, tm=tm, tn=tn, beta=beta,
        r_cutoff=r_cutoff, t_dim=t2 // 2, use_groups=use_groups,
        r_switch=r_switch)
    fout = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # pos rows
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # q rows
            pl.BlockSpec((tm, t2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # ab rows
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # bits rows
            pl.BlockSpec((tm, grows.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # group rows
            pl.BlockSpec(memory_space=pltpu.VMEM),          # posT full
            pl.BlockSpec(memory_space=pltpu.VMEM),          # qT full
            pl.BlockSpec(memory_space=pltpu.VMEM),          # onehotT full
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bitsT full
            pl.BlockSpec(memory_space=pltpu.VMEM),          # gonehotT full
            pl.BlockSpec(memory_space=pltpu.SMEM),          # box (3,)
        ],
        out_specs=pl.BlockSpec((tm, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(pos2d, q2d, ab, bits2d, grows, posT, qT, onehotT, bitsT, gonehotT, box)
    return fout


def residual_adjustment(pos, box, charges, tables, beta, r_cutoff,
                        e_lj, e_coul, e_corr, forces, r_switch=0.0):
    """Exclusion pairs whose index offset exceeds the kernels' 31-bit
    window, handled exactly as in allpairs (tiny list): subtract their
    direct-space contribution, add the reciprocal correction.  Shared by
    direct_space_pallas and the row-sharded multi-chip sweep."""
    res = tables["residual"]
    if res.shape[0] == 0:
        return e_lj, e_coul, e_corr, forces
    from . import allpairs as ap
    from ..utils.pbc import minimum_image
    i, j = res[:, 0], res[:, 1]
    dr = minimum_image(pos[i] - pos[j], box)
    r2 = jnp.sum(dr * dr, -1)
    if "residual_a" in tables:
        # static per-pair coefficients precomputed at table build — no
        # (R,T) table gathers in the step (~1.3 ms at EDL's R = 13,448)
        a = jnp.asarray(tables["residual_a"])
        b = jnp.asarray(tables["residual_b"])
    else:
        arows = jnp.asarray(tables["arows"])
        brows = jnp.asarray(tables["brows"])
        onehot = jnp.asarray(tables["onehot"])
        a = jnp.sum(arows[i] * onehot[j], -1)
        b = jnp.sum(brows[i] * onehot[j], -1)
        if tables["grows"] is not None:
            allowed = jnp.sum(jnp.asarray(tables["grows"])[i]
                              * jnp.asarray(tables["gonehot"])[j], -1)
            a = a * allowed
            b = b * allowed
    if "residual_qq" in tables:
        qq = jnp.asarray(tables["residual_qq"])
    else:
        qq = ONE_4PI_EPS0 * charges[i] * charges[j]
    ones = jnp.ones(r2.shape, bool)
    _, _, e_corr_r, _, _, f_corr_only = ap._pair_terms(
        r2, qq, a, b, beta, r_cutoff,
        direct_mask=jnp.zeros_like(ones), corr_mask=ones)
    e_lj_d, e_coul_d, _, _, _, f_direct_only = ap._pair_terms(
        r2, qq, a, b, beta, r_cutoff, direct_mask=ones,
        corr_mask=jnp.zeros_like(ones), r_switch=r_switch)
    e_lj = e_lj - jnp.sum(e_lj_d)
    e_coul = e_coul - jnp.sum(e_coul_d)
    e_corr = e_corr + jnp.sum(e_corr_r)
    f_adj = (f_corr_only - f_direct_only)[:, None] * dr
    if "res_atoms" in tables:
        # atom-major accumulation on the compact involved-atom set (see
        # allpairs.build_pair_tables): gather each atom's incident pair
        # forces, then ONE small scatter instead of two full-list ones
        fpad = jnp.concatenate(
            [f_adj, jnp.zeros((1, 3), f_adj.dtype)], axis=0)
        incid = jnp.asarray(tables["res_incid"])         # (U,A)
        sign = jnp.asarray(tables["res_sign"])           # (U,A)
        idx = jnp.where(incid >= 0, incid, f_adj.shape[0])
        acc = jnp.sum(sign[..., None] * fpad[idx], axis=1)
        forces = forces.at[jnp.asarray(tables["res_atoms"])].add(acc)
    else:
        forces = forces.at[i].add(f_adj).at[j].add(-f_adj)
    return e_lj, e_coul, e_corr, forces


def banded_sweep_sharded(mesh, axis_name, pos, box, charges, tables,
                         beta, r_cutoff, ts, band_w,
                         cache: "PairCache | None" = None,
                         want_energy: bool = True, interpret: bool = False,
                         r_switch: float = 0.0):
    """The production z-banded pair sweep sharded over row tiles of a
    jax.sharding.Mesh: each device runs the SAME Mosaic kernel over its
    n_tiles/n_dev row tiles (row blocks + per-row statics sharded on the
    atom axis; the column tables are replicated), then the column-side
    Newton reaction accumulator is psum'd over ICI.  Returns
    (e_lj, e_coul, e_corr, e14_coul, e14_lj, forces) like
    direct_space_pallas (residual-pair adjustment excluded — callers apply
    it on the gathered result).

    Requires n_pad % (ts * n_dev) == 0 and the banded enumeration to be
    eligible; exactness vs the unsharded kernel is locked by
    tests/test_multichip.py on the virtual CPU mesh in interpret mode.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = pos.shape[0]
    n_dev = mesh.devices.size
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    if cache is None:
        cache = make_pair_cache(pos, box_arr, charges, tables, ts,
                                tile_multiple=n_dev)
    n_pad = int(cache.perm.shape[0])
    pad = n_pad - n
    if n_pad % (ts * n_dev) != 0:
        raise ValueError(
            f"n_pad={n_pad} not divisible by ts*n_dev={ts * n_dev}; build "
            f"the cache with make_pair_cache(..., tile_multiple=n_dev)")
    pos2d = jnp.concatenate(
        [pos, jnp.full((pad, 3), 1e6, jnp.float32)], axis=0)[cache.perm]
    n_tiles = n_pad // ts
    # the circular band ring spans only the tiles holding real atoms (pads
    # sort last); ring-wrap pairs (z top <-> bottom) must use THIS modulus
    # or tile-count padding would push them beyond band_w
    n_tiles_real = (n + ts - 1) // ts
    if not band_eligible(n_tiles_real * ts, ts, band_w):
        raise ValueError("banded enumeration not eligible for this size")
    tiles_local = n_tiles // n_dev
    rows_local = tiles_local * ts
    t_dim = int(np.asarray(tables["arows"]).shape[1])
    has14 = bool(tables.get("has_exc14", False))
    oid2d = cache.perm.reshape(-1, 1)

    def shard_fn(pos2d_l, q2d_l, ab_l, bits_l, bits14_l, oid_l, grows_l,
                 posT, qT, onehotT, bitsT, bits14T, oidT, gonehotT, boxs):
        row_off = (jax.lax.axis_index(axis_name)
                   * jnp.int32(tiles_local)).reshape(())
        rows, colacc = _tri_call(
            "bandall", (tiles_local, band_w + 1), pos2d_l, q2d_l, ab_l,
            bits_l, bits14_l, oid_l, grows_l, posT, qT, onehotT, bitsT,
            bits14T, oidT, gonehotT, boxs, float(beta), float(r_cutoff),
            ts, n, t_dim, has14, interpret, want_energy=want_energy,
            row_off=row_off[None], n_tiles_g=n_tiles_real,
            r_switch=r_switch)
        colacc = jax.lax.psum(colacc, axis_name)
        return rows, colacc

    rows, colacc = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )(pos2d, cache.q2d, cache.ab, cache.bits2d, cache.bits14_2d, oid2d,
      cache.grows, pos2d.T, cache.qT, cache.onehotT, cache.bitsT,
      cache.bits14T, cache.oidT, cache.gonehotT, box_arr)
    f_full = rows[:, :3] + colacc[:3, :].T
    forces = f_full[cache.invperm][:n]
    return (jnp.sum(rows[:, 3]), jnp.sum(rows[:, 4]), jnp.sum(rows[:, 5]),
            jnp.sum(rows[:, 6]), jnp.sum(rows[:, 7]), forces)


def direct_space_pallas(pos, box, charges, tables, beta, r_cutoff,
                        tm: int = 256, tn: int = 512, interpret: bool = False,
                        symmetric: bool = True, ts: int = 512,
                        band_w: int = 0, want_energy: bool = True,
                        cache: "PairCache | None" = None,
                        with_flag: bool = False, mode: str = "band",
                        plist_cap: int = 0, skin: float = 0.1,
                        plist_sort: str = "morton", r_switch: float = 0.0,
                        strict: bool = True,
                        nowrap=(False, False, False)):
    """Drop-in replacement for allpairs.direct_space_dense on TPU.

    symmetric=True runs the upper-triangle kernel (half the pair work via
    Newton's third law); False runs the full rectangular sweep.

    mode="band" with band_w > 0 enables the z-banded sweep: atoms are
    sorted by wrapped z and only tile pairs within band_w circular tile
    offsets are computed; exclusion masks are tested against carried
    original indices inside the kernel, so the sort needs no cluster
    structure.

    mode="plist" with plist_cap > 0 enables the Morton tile-pair-list
    sweep: atoms are sorted in 3-D Z-order and only tile pairs whose
    circular AABBs come within cutoff+skin are enumerated (scalar-
    prefetched list) — unlike the z band this also culls the x/y
    cross-section, ~2x fewer pair slots on the bulk workloads.

    Pass a PairCache (from make_pair_cache with the matching mode,
    refreshed every few dozen steps) to skip the per-call sort and
    static-table permutation; without one the sort happens here.  A
    per-call coverage check against CURRENT positions (band_coverage_bad /
    plist_coverage_bad) selects an exhaustive full-sweep fallback branch if
    an uncovered tile pair ever comes within the cutoff, so a stale cached
    sort, a band narrower than the current density, or a pair-list overflow
    still produce CORRECT forces — callers additionally rebuild the cache
    when the check trips so the fallback only pays for one step."""
    n = pos.shape[0]
    blk = ts if symmetric else max(tm, tn)
    n_pad = ((n + blk - 1) // blk) * blk
    pad = n_pad - n
    use_plist = symmetric and mode == "plist" and plist_cap > 0
    use_band = (symmetric and not use_plist
                and band_eligible(n_pad, ts, band_w))
    box_arr = jnp.asarray(box, jnp.float32).reshape(3)
    iota = jnp.arange(n_pad, dtype=jnp.int32)

    pos2d = jnp.concatenate(
        [pos, jnp.full((pad, 3), 1e6, jnp.float32)], axis=0)

    flag = None
    invperm = None
    if use_plist:
        if cache is None or cache.plist is None:
            cache = make_pair_cache(pos, box_arr, charges, tables, ts,
                                    mode=plist_sort, cap=plist_cap,
                                    rc_cand=r_cutoff + skin, nowrap=nowrap)
        invperm = cache.invperm
        pos2d = pos2d[cache.perm]
        q2d, ab, bits2d, grows = cache.q2d, cache.ab, cache.bits2d, \
            cache.grows
        bits14_2d = cache.bits14_2d
        oid2d = cache.perm.reshape(-1, 1)
        qT, bitsT, oidT = cache.qT, cache.bitsT, cache.oidT
        bits14T = cache.bits14T
        onehotT, gonehotT = cache.onehotT, cache.gonehotT
        flag = plist_coverage_bad(pos2d, box_arr, cache, ts, r_cutoff,
                                  nowrap=nowrap)
    elif use_band:
        if cache is None:
            cache = make_pair_cache(pos, box_arr, charges, tables, ts)
        invperm = cache.invperm
        pos2d = pos2d[cache.perm]
        q2d, ab, bits2d, grows = cache.q2d, cache.ab, cache.bits2d, \
            cache.grows
        bits14_2d = cache.bits14_2d
        oid2d = cache.perm.reshape(-1, 1)
        qT, bitsT, oidT = cache.qT, cache.bitsT, cache.oidT
        bits14T = cache.bits14T
        onehotT, gonehotT = cache.onehotT, cache.gonehotT
        # coverage check on CURRENT positions; selects the full-sweep
        # fallback branch below when the band misses an interacting pair
        flag = band_coverage_bad(pos, box_arr, cache, ts, band_w, r_cutoff)
    else:
        q2d, ab, bits2d, bits14_2d, onehot2d, grows, gonehot2d = \
            _padded_statics(n, pad, charges, tables)
        oid2d = iota.reshape(-1, 1)
        qT = q2d.T
        bitsT = bits2d.T
        bits14T = bits14_2d.T
        oidT = oid2d.T
        onehotT = onehot2d.T
        gonehotT = gonehot2d.T

    posT = pos2d.T

    if symmetric:
        t_dim = int(np.asarray(tables["arows"]).shape[1])
        has14 = bool(tables.get("has_exc14", False))
        tri_args = (pos2d, q2d, ab, bits2d, bits14_2d, oid2d,
                    grows, posT, qT, onehotT, bitsT, bits14T,
                    oidT, gonehotT, box_arr)
        tri_kw = dict(beta=float(beta), r_cutoff=float(r_cutoff), ts=ts,
                      n_real=n, t_dim=t_dim, has14=has14,
                      want_energy=want_energy, interpret=interpret,
                      r_switch=float(r_switch))
        if use_plist:
            if has14:
                raise NotImplementedError(
                    "plist mode folds 1-4 exceptions via the dense "
                    "molecular path; build tables with fold_exc14=False")
            # pair-list sweep.  strict=True wraps it in a lax.cond whose
            # other branch is the exhaustive sorted-layout sweep, taken
            # whenever the coverage check trips or the candidate list
            # overflowed — that step stays exact, merely slower.
            # strict=False (the Context production default) runs the list
            # unconditionally: a tripped step may miss a pair that just
            # crossed into the cutoff (force there ~1e-3 kJ/mol/nm — the
            # classical Verlet-buffer miss every production MD engine
            # accepts) and the flag still forces an immediate cache
            # rebuild; dropping the cond removes ~60-90 us/step of XLA
            # conditional operand/result copies around the kernel.
            def _plist_branch(a):
                # a = tri_args; the stacked tables come from the cache
                return _run_plist(
                    cache.plist, a[0], a[1], cache.ab2, a[3], a[5], a[7],
                    a[8], cache.oh2T, a[10], a[12], a[14],
                    beta=float(beta), r_cutoff=float(r_cutoff), ts=ts,
                    n_real=n, want_energy=want_energy,
                    interpret=interpret, r_switch=float(r_switch),
                    nowrap=nowrap)

            if strict:
                rows, colacc = jax.lax.cond(
                    flag,
                    lambda a: _run_tri(*a, band_w=0, full_sweep=True,
                                       **tri_kw),
                    _plist_branch,
                    tri_args)
            else:
                rows, colacc = _plist_branch(tri_args)
            f_full = rows[:, :3] + colacc[:3, :].T
            forces = f_full[invperm][:n]
        elif use_band:
            # banded sweep; strict semantics as in the plist branch above
            if strict:
                rows, colacc = jax.lax.cond(
                    flag,
                    lambda a: _run_tri(*a, band_w=0, full_sweep=True,
                                       **tri_kw),
                    lambda a: _run_tri(*a, band_w=band_w, **tri_kw),
                    tri_args)
            else:
                rows, colacc = _run_tri(*tri_args, band_w=band_w, **tri_kw)
            f_full = rows[:, :3] + colacc[:3, :].T
            forces = f_full[invperm][:n]
        else:
            rows, colacc = _run_tri(*tri_args, band_w=0, **tri_kw)
            forces = rows[:n, :3] + colacc[:3, :n].T
        e_lj = jnp.sum(rows[:, 3])
        e_coul = jnp.sum(rows[:, 4])
        e_corr = jnp.sum(rows[:, 5])
        e14_coul = jnp.sum(rows[:, 6])
        e14_lj = jnp.sum(rows[:, 7])
    else:
        if tables.get("has_exc14", False):
            raise NotImplementedError(
                "kernel-handled 1-4 exceptions require the symmetric sweep")
        fout = _run(pos2d, q2d, ab, bits2d, grows, posT, qT,
                    onehotT, bitsT, gonehotT, box_arr,
                    float(beta), float(r_cutoff), tm, tn, n, interpret,
                    r_switch=float(r_switch))
        forces = fout[:n, :3]
        e_lj = 0.5 * jnp.sum(fout[:, 3])
        e_coul = 0.5 * jnp.sum(fout[:, 4])
        e_corr = 0.5 * jnp.sum(fout[:, 5])
        e14_coul = e14_lj = jnp.zeros((), jnp.float32)

    # residual excluded pairs handled exactly as in allpairs (tiny list)
    e_lj, e_coul, e_corr, forces = residual_adjustment(
        pos, box, charges, tables, beta, r_cutoff,
        e_lj, e_coul, e_corr, forces, r_switch=r_switch)
    if with_flag:
        # device bool: this call took the full-sweep fallback; the caller
        # should rebuild its sort cache before the next step
        cov = flag if flag is not None else jnp.zeros((), bool)
        return e_lj, e_coul, e_corr, e14_coul, e14_lj, forces, cov
    return e_lj, e_coul, e_corr, e14_coul, e14_lj, forces
