"""Holonomic distance constraints: iterative SHAKE (positions) and RATTLE
(velocities), fully vectorized and scatter-free.

The reference delegates constraints to OpenMM's CudaIntegrationUtilities
(applyConstraints / applyVelocityConstraints, called from
CudaVVKernels.cpp:151,176,334,425).  Here both phases are Jacobi-style fixed
-point iterations inside jit:

* every constraint's correction is computed in parallel (C,3);
* every atom then *gathers* the corrections of its incident constraints
  (per-atom incidence table, at most A per atom) — no scatter in the loop;
* iteration stops on the 1e-5 relative tolerance the reference sets
  (VVIntegrator.cpp:56) or a fixed max iteration count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.pbc import minimum_image

i32 = jnp.int32
f32 = jnp.float32


@struct.dataclass
class ConstraintData:
    pairs: jnp.ndarray       # (C,2) i32
    dist: jnp.ndarray        # (C,)
    inv_mass_sum: jnp.ndarray  # (C,) 1/mi + 1/mj
    atom_cons: jnp.ndarray   # (N,A) i32 constraint ids incident to atom, -1 pad
    atom_sign: jnp.ndarray   # (N,A) f32 +1 if atom is pair[...,0], else -1
    # ---- exact per-cluster solver tables (None when a cluster exceeds K) ----
    # Constraints partition into small connected clusters (CH stars, rigid
    # water triangles).  The RATTLE system is linear and the SHAKE system is
    # solved by a few Newton iterations — both as batched (NCL,K,K) solves.
    cl_cons: jnp.ndarray     # (NCL,K) i32 constraint ids, -1 pad
    cl_w: jnp.ndarray        # (NCL,K,K) coupling weights sum(+-1/m_shared)
    cl_slot: jnp.ndarray     # (C,) i32 flat slot (cluster*K + k) of constraint
    # cluster-local solve tables: every Newton iteration runs on (NCL,...)
    # tensors; the global (N,3) arrays are read once and written once.
    cl_atoms: jnp.ndarray    # (NCL,A) i32 atom ids, -1 pad
    cl_ai: jnp.ndarray       # (NCL,K) i32 local slot of pair[...,0]
    cl_bi: jnp.ndarray       # (NCL,K) i32 local slot of pair[...,1]
    cl_sign: jnp.ndarray     # (NCL,A,K) f32 +1/-1/0 incidence
    cl_invm: jnp.ndarray     # (NCL,A) f32 inverse masses (0 for pad)
    cl_d2: jnp.ndarray       # (NCL,K) f32 target distance^2 (1 for pad)
    atom_slot: jnp.ndarray   # (N,) i32 flat (cluster*A+a) slot, 0 if none
    atom_in_cluster: jnp.ndarray  # (N,) bool
    tolerance: float = struct.field(pytree_node=False, default=1e-5)
    max_iterations: int = struct.field(pytree_node=False, default=150)
    use_clusters: bool = struct.field(pytree_node=False, default=False)
    newton_iters: int = struct.field(pytree_node=False, default=3)

    @property
    def n_constraints(self):
        return self.pairs.shape[0]


def build_constraint_data(pairs, dists, inv_masses, tolerance=1e-5,
                          max_iterations=150) -> ConstraintData:
    pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
    dists = np.asarray(dists, np.float32).reshape(-1)
    n = len(inv_masses)
    c = pairs.shape[0]
    incid = [[] for _ in range(n)]
    signs = [[] for _ in range(n)]
    for ci, (a, b) in enumerate(pairs):
        incid[a].append(ci)
        signs[a].append(1.0)
        incid[b].append(ci)
        signs[b].append(-1.0)
    a_max = max((len(x) for x in incid), default=0)
    a_max = max(a_max, 1)
    atom_cons = np.full((n, a_max), -1, np.int32)
    atom_sign = np.zeros((n, a_max), np.float32)
    for i in range(n):
        for k, (ci, s) in enumerate(zip(incid[i], signs[i])):
            atom_cons[i, k] = ci
            atom_sign[i, k] = s
    ims = np.asarray(inv_masses, np.float32)
    inv_mass_sum = ims[pairs[:, 0]] + ims[pairs[:, 1]] if c else np.zeros((0,), np.float32)
    # ---- cluster decomposition (union-find over shared atoms) ----
    K_CAP = 4
    parent = list(range(c))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    atom_last = {}
    for ci, (a, b) in enumerate(pairs):
        for at in (int(a), int(b)):
            if at in atom_last:
                ra, rb = find(atom_last[at]), find(ci)
                if ra != rb:
                    parent[rb] = ra
            atom_last[at] = ci
    clusters = {}
    for ci in range(c):
        clusters.setdefault(find(ci), []).append(ci)
    use_clusters = c > 0 and all(len(v) <= K_CAP for v in clusters.values())
    # pad to the actual largest cluster (3 for CH stars / water triangles)
    K = max((len(v) for v in clusters.values()), default=1) if use_clusters \
        else K_CAP
    if use_clusters and c > 0:
        ncl = len(clusters)
        cl_cons = np.full((ncl, K), -1, np.int32)
        cl_slot = np.zeros((c,), np.int32)
        cluster_atom_lists = []
        for r, (root, members) in enumerate(sorted(clusters.items())):
            cl_cons[r, :len(members)] = members
            atoms = []
            for k, m in enumerate(members):
                cl_slot[m] = r * K + k
                for a in (int(pairs[m, 0]), int(pairs[m, 1])):
                    if a not in atoms:
                        atoms.append(a)
            cluster_atom_lists.append(atoms)
        # coupling weights w[c,c'] = sum over shared atoms of
        # sign_c(a)*sign_c'(a)/m_a  (sign +1 for the first atom of the pair)
        cc = np.maximum(cl_cons, 0)
        w = np.zeros((ncl, K, K), np.float32)
        for r in range(ncl):
            for x in range(K):
                for y in range(K):
                    cx, cy = cl_cons[r, x], cl_cons[r, y]
                    if cx < 0 or cy < 0:
                        w[r, x, y] = 1.0 if x == y else 0.0
                        continue
                    acc = 0.0
                    for ax, sx in ((pairs[cx, 0], 1.0), (pairs[cx, 1], -1.0)):
                        for ay, sy in ((pairs[cy, 0], 1.0),
                                       (pairs[cy, 1], -1.0)):
                            if ax == ay:
                                acc += sx * sy * float(inv_masses[ax])
                    w[r, x, y] = acc
        A = max(len(a) for a in cluster_atom_lists)
        cl_atoms = np.full((ncl, A), -1, np.int32)
        cl_ai = np.zeros((ncl, K), np.int32)
        cl_bi = np.ones((ncl, K), np.int32)
        cl_sign = np.zeros((ncl, A, K), np.float32)
        cl_invm = np.zeros((ncl, A), np.float32)
        cl_d2 = np.ones((ncl, K), np.float32)
        ims_np = np.asarray(inv_masses, np.float32)
        for r, atoms in enumerate(cluster_atom_lists):
            cl_atoms[r, :len(atoms)] = atoms
            cl_invm[r, :len(atoms)] = ims_np[atoms]
            for k in range(K):
                m = cl_cons[r, k]
                if m < 0:
                    continue
                ai = atoms.index(int(pairs[m, 0]))
                bi = atoms.index(int(pairs[m, 1]))
                cl_ai[r, k] = ai
                cl_bi[r, k] = bi
                cl_sign[r, ai, k] = 1.0
                cl_sign[r, bi, k] = -1.0
                cl_d2[r, k] = float(dists[m]) ** 2
        n_atoms_total = n
        atom_slot = np.zeros((n_atoms_total,), np.int32)
        atom_in_cluster = np.zeros((n_atoms_total,), bool)
        for r, atoms in enumerate(cluster_atom_lists):
            for a_local, a in enumerate(atoms):
                atom_slot[a] = r * A + a_local
                atom_in_cluster[a] = True
    else:
        cl_cons = np.zeros((0, K), np.int32)
        w = np.zeros((0, K, K), np.float32)
        cl_slot = np.zeros((c,), np.int32)
        cl_atoms = np.zeros((0, 2), np.int32)
        cl_ai = np.zeros((0, K), np.int32)
        cl_bi = np.zeros((0, K), np.int32)
        cl_sign = np.zeros((0, 2, K), np.float32)
        cl_invm = np.zeros((0, 2), np.float32)
        cl_d2 = np.ones((0, K), np.float32)
        atom_slot = np.zeros((n,), np.int32)
        atom_in_cluster = np.zeros((n,), bool)

    # host numpy: embeds as compile-time constants inside the jitted step so
    # TPU gathers take the fast constant-index lowering
    return ConstraintData(
        pairs=pairs, dist=dists, inv_mass_sum=inv_mass_sum,
        atom_cons=atom_cons, atom_sign=atom_sign,
        cl_cons=cl_cons, cl_w=w, cl_slot=cl_slot,
        cl_atoms=cl_atoms, cl_ai=cl_ai, cl_bi=cl_bi, cl_sign=cl_sign,
        cl_invm=cl_invm, cl_d2=cl_d2, atom_slot=atom_slot,
        atom_in_cluster=atom_in_cluster,
        use_clusters=bool(use_clusters),
        tolerance=tolerance, max_iterations=max_iterations)


def _apply_corrections(x, cons: ConstraintData, g, ref, inv_masses):
    """x_a += -inv_m_a * sum_{c incident} sign * g_c * ref_c  (gather form)."""
    cid = jnp.maximum(cons.atom_cons, 0)                     # (N,A)
    valid = (cons.atom_cons >= 0).astype(x.dtype)
    contrib = (g[cid] * valid * cons.atom_sign)[..., None] * ref[cid]  # (N,A,3)
    return x - inv_masses[:, None] * jnp.sum(contrib, axis=1)


def _solve_small(A, b):
    """Batched solve for the (NCL,K,K) cluster systems.  K <= 3 (the real
    workloads: CH stars and water triangles) uses closed-form Cramer rules —
    pure elementwise ops on (NCL,) vectors, far fewer fused ops than an
    elimination loop.  Larger K falls back to unrolled Gaussian elimination
    (no pivoting — A is an SPD Gram matrix; batched LAPACK-style LU is far
    slower on TPU for tiny K)."""
    K = A.shape[-1]
    A = jnp.asarray(A)
    if K == 1:
        return b / A[..., 0, 0:1]
    if K == 2:
        a, bb, c, d = A[..., 0, 0], A[..., 0, 1], A[..., 1, 0], A[..., 1, 1]
        det = a * d - bb * c
        inv = 1.0 / det
        x0 = (d * b[..., 0] - bb * b[..., 1]) * inv
        x1 = (a * b[..., 1] - c * b[..., 0]) * inv
        return jnp.stack([x0, x1], axis=-1)
    if K == 3:
        a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
        a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
        a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        det = a00 * c00 + a01 * c01 + a02 * c02
        inv = 1.0 / det
        b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
        x0 = (b0 * c00 + a01 * (a12 * b2 - a22 * b1)
              + a02 * (a21 * b1 - a11 * b2)) * inv
        x1 = (a00 * (a22 * b1 - a12 * b2) + b0 * c01
              + a02 * (a10 * b2 - a20 * b1)) * inv
        x2 = (a00 * (a11 * b2 - a21 * b1) + a01 * (a20 * b1 - a10 * b2)
              + b0 * c02) * inv
        return jnp.stack([x0, x1, x2], axis=-1)
    b = b[..., None]
    M = jnp.concatenate([A, b], axis=-1)                      # (NCL,K,K+1)
    for k in range(K):
        piv = M[:, k:k + 1, :] / M[:, k:k + 1, k:k + 1]       # normalize row k
        below = M[:, k + 1:, k:k + 1]
        M = jnp.concatenate([
            M[:, :k + 1, :],
            M[:, k + 1:, :] - below * piv], axis=1)
    # back substitution
    x = [None] * K
    for k in reversed(range(K)):
        acc = M[:, k, K]
        for l in range(k + 1, K):
            acc = acc - M[:, k, l] * x[l]
        x[k] = acc / M[:, k, k]
    return jnp.stack(x, axis=-1)                              # (NCL,K)


def _apply_cluster_g(x, cons, g_cl, ref, inv_masses):
    """x_a -= inv_m_a * sum_c sign_ac g_c ref_c with g given per cluster."""
    # back to per-constraint order via the static slot map (gather, not
    # scatter — constant indices take the fast TPU lowering)
    g = g_cl.reshape(-1)[cons.cl_slot]
    return _apply_corrections(x, cons, g, ref, inv_masses)


def _local_gather(x, cons):
    """(N,3) -> (NCL,A,3) cluster-local copies (constant-index gather)."""
    idx = np.maximum(np.asarray(cons.cl_atoms), 0)
    return x[idx]


def _local_pair(xloc, cons):
    ai = np.asarray(cons.cl_ai)
    bi = np.asarray(cons.cl_bi)
    xa = jnp.take_along_axis(xloc, jnp.asarray(ai)[..., None], axis=1)
    xb = jnp.take_along_axis(xloc, jnp.asarray(bi)[..., None], axis=1)
    return xa - xb                                             # (NCL,K,3)


def _local_writeback(x_global, xloc, cons):
    flat = xloc.reshape(-1, xloc.shape[-1])
    mask = np.asarray(cons.atom_in_cluster)[:, None]
    return jnp.where(mask, flat[np.asarray(cons.atom_slot)], x_global)


def solve_velocity_clusters(pos, vel, box, cons: ConstraintData, inv_masses):
    """Exact RATTLE: the velocity projection is linear — one batched (K,K)
    solve per cluster, no iteration (vs OpenMM's iterative CCMA).  Runs
    entirely on cluster-local tensors."""
    ploc = _local_gather(pos, cons)                            # (NCL,A,3)
    vloc = _local_gather(vel, cons)
    ref = minimum_image(_local_pair(ploc, cons), box)          # (NCL,K,3)
    rv = jnp.sum(_local_pair(vloc, cons) * ref, -1)            # (NCL,K)
    pad = np.asarray(cons.cl_cons) >= 0
    dots = jnp.einsum("nkx,nlx->nkl", ref, ref)
    A = cons.cl_w * dots
    eye = np.eye(cons.cl_cons.shape[1], dtype=np.float32)
    A = jnp.where(np.asarray(pad[:, :, None] & pad[:, None, :]), A, eye)
    g = _solve_small(A, rv * pad)                              # (NCL,K)
    dv = jnp.einsum("nak,nk,nkx->nax", np.asarray(cons.cl_sign), g, ref)
    vloc = vloc - np.asarray(cons.cl_invm)[..., None] * dv
    return _local_writeback(vel, vloc, cons)


def solve_position_clusters(pos_ref, pos_new, box, cons: ConstraintData,
                            inv_masses):
    """SHAKE via Newton on the per-cluster system: sigma_c = |x_i-x_j|^2-d^2,
    J_cc' = 2 (delta_c . ref_c') w_cc'; each Newton iteration is one batched
    (K,K) solve on cluster-local tensors (the global arrays are read once,
    written once).  newton_iters=3 reaches the f32 floor."""
    refloc = _local_gather(pos_ref, cons)
    xloc = _local_gather(pos_new, cons)
    ref = minimum_image(_local_pair(refloc, cons), box)        # (NCL,K,3)
    pad = np.asarray(cons.cl_cons) >= 0
    eye = np.eye(cons.cl_cons.shape[1], dtype=np.float32)
    padm = np.asarray(pad[:, :, None] & pad[:, None, :])
    sign = np.asarray(cons.cl_sign)
    invm = np.asarray(cons.cl_invm)[..., None]

    def body(_, x):
        delta = minimum_image(_local_pair(x, cons), box)
        sigma = jnp.sum(delta * delta, -1) - cons.cl_d2
        J = 2.0 * cons.cl_w * jnp.einsum("nkx,nlx->nkl", delta, ref)
        J = jnp.where(padm, J, eye)
        g = _solve_small(J, sigma * pad)
        dxl = jnp.einsum("nak,nk,nkx->nax", sign, g, ref)
        return x - invm * dxl

    xloc = jax.lax.fori_loop(0, cons.newton_iters, body, xloc)
    return _local_writeback(pos_new, xloc, cons)


def apply_position_constraints(pos_ref, pos_new, box, cons: ConstraintData,
                               inv_masses):
    """SHAKE: move pos_new so that constrained distances equal their targets,
    using the (constraint-satisfying) reference geometry pos_ref for the
    correction directions."""
    if cons.n_constraints == 0:
        return pos_new
    if cons.use_clusters:
        return solve_position_clusters(pos_ref, pos_new, box, cons,
                                       inv_masses)
    i, j = cons.pairs[:, 0], cons.pairs[:, 1]
    ref = minimum_image(pos_ref[i] - pos_ref[j], box)          # (C,3) fixed
    d2 = cons.dist * cons.dist

    def cond(carry):
        pos, it, err = carry
        return (err > cons.tolerance) & (it < cons.max_iterations)

    def body(carry):
        pos, it, _ = carry
        delta = minimum_image(pos[i] - pos[j], box)
        r2 = jnp.sum(delta * delta, -1)
        diff = r2 - d2
        denom = 2.0 * cons.inv_mass_sum * jnp.sum(delta * ref, -1)
        g = diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        pos = _apply_corrections(pos, cons, g, ref, inv_masses)
        err = jnp.max(jnp.abs(diff) / d2)
        return pos, it + 1, err

    pos, _, _ = jax.lax.while_loop(cond, body,
                                   (pos_new, jnp.zeros((), i32),
                                    jnp.ones((), pos_new.dtype)))
    return pos


def apply_velocity_constraints(pos, vel, box, cons: ConstraintData, inv_masses):
    """RATTLE: project velocities so d/dt of each constrained distance is 0."""
    if cons.n_constraints == 0:
        return vel
    if cons.use_clusters:
        return solve_velocity_clusters(pos, vel, box, cons, inv_masses)
    i, j = cons.pairs[:, 0], cons.pairs[:, 1]
    ref = minimum_image(pos[i] - pos[j], box)
    d2 = jnp.sum(ref * ref, -1)
    denom = cons.inv_mass_sum * d2
    scale = 1.0 / jnp.where(denom > 1e-12, denom, 1e-12)

    def cond(carry):
        vel, it, err = carry
        return (err > cons.tolerance) & (it < cons.max_iterations)

    def body(carry):
        vel, it, _ = carry
        rv = jnp.sum((vel[i] - vel[j]) * ref, -1)
        g = rv * scale
        vel = _apply_corrections(vel, cons, g, ref, inv_masses)
        # relative velocity along the bond divided by bond length (1/ps);
        # the projection is linear so this converges geometrically.
        err = jnp.max(jnp.abs(rv) / jnp.maximum(d2, 1e-12))
        return vel, it + 1, err

    vel, _, _ = jax.lax.while_loop(cond, body,
                                   (vel, jnp.zeros((), i32),
                                    jnp.ones((), vel.dtype)))
    return vel
