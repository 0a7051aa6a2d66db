#!/usr/bin/env python3
"""Independent float64 NumPy oracle for the force field.

Re-implements every energy term from scratch (plain loops/numpy, math.erfc,
no shared code with openmm_velocityverlet_tpu.ops) and evaluates the initial
configuration of the bundled reference models.  The resulting per-term
energies are stored as goldens in tests/golden/<model>.json and
regression-locked by tests/test_models_matrix.py — a sign or scale error in
any engine term then fails CI (VERDICT round-1 item 3; the reference's own
validation is energy decomposition, examples/ommhelper/util.py:57-63).

The topology/parameter tables come from the engine's loaders (loader parity
is covered separately by tests/test_loaders.py); every formula here is
independent.

Usage: python tools/compute_golden.py [model ...]   (CPU, float64, ~2 min)
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ONE_4PI_EPS0 = 138.935456


def minimum_image(d, box):
    return d - box * np.round(d / box)


def golden_energies(system, pos, box):
    s = system
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64)
    n = pos.shape[0]
    out = {}

    # ---- virtual sites placed first (LocalCoordinatesSite) ----
    vidx = np.asarray(s.vsite_index)
    if vidx.size:
        pos = pos.copy()
        par = np.asarray(s.vsite_parents)
        ow = np.asarray(s.vsite_origin_w, np.float64)
        xw = np.asarray(s.vsite_x_w, np.float64)
        yw = np.asarray(s.vsite_y_w, np.float64)
        loc = np.asarray(s.vsite_local, np.float64)
        for v in range(len(vidx)):
            p = pos[par[v]]                       # (3,3)
            origin = ow[v] @ p
            xdir = xw[v] @ p
            ydir = yw[v] @ p
            zdir = np.cross(xdir, ydir)
            xhat = xdir / np.linalg.norm(xdir)
            zhat = zdir / np.linalg.norm(zdir)
            yhat = np.cross(zhat, xhat)
            pos[vidx[v]] = (origin + loc[v, 0] * xhat + loc[v, 1] * yhat
                            + loc[v, 2] * zhat)

    # ---- bonded ----
    def bond_e(pairs, r0, k):
        if len(pairs) == 0:
            return 0.0
        d = minimum_image(pos[pairs[:, 0]] - pos[pairs[:, 1]], box)
        r = np.linalg.norm(d, axis=1)
        return float(np.sum(0.5 * np.asarray(k, np.float64)
                            * (r - np.asarray(r0, np.float64)) ** 2))

    out["bond"] = bond_e(np.asarray(s.bonds), s.bond_r0, s.bond_k)
    out["urey_bradley"] = bond_e(np.asarray(s.ub_bonds), s.ub_r0, s.ub_k)

    ang = np.asarray(s.angles)
    if ang.size:
        v1 = minimum_image(pos[ang[:, 0]] - pos[ang[:, 1]], box)
        v2 = minimum_image(pos[ang[:, 2]] - pos[ang[:, 1]], box)
        ct = np.sum(v1 * v2, 1) / (np.linalg.norm(v1, axis=1)
                                   * np.linalg.norm(v2, axis=1))
        th = np.arccos(np.clip(ct, -1, 1))
        out["angle"] = float(np.sum(
            0.5 * np.asarray(s.angle_k, np.float64)
            * (th - np.asarray(s.angle_theta0, np.float64)) ** 2))
    else:
        out["angle"] = 0.0

    def dihedral_phi(idx):
        b1 = minimum_image(pos[idx[:, 1]] - pos[idx[:, 0]], box)
        b2 = minimum_image(pos[idx[:, 2]] - pos[idx[:, 1]], box)
        b3 = minimum_image(pos[idx[:, 3]] - pos[idx[:, 2]], box)
        m = np.cross(b1, b2)
        nn = np.cross(b2, b3)
        b2n = b2 / np.linalg.norm(b2, axis=1)[:, None]
        y = np.sum(np.cross(m, b2n) * nn, 1)
        x = np.sum(m * nn, 1)
        return np.arctan2(y, x)

    dih = np.asarray(s.dihedrals)
    if dih.size:
        phi = dihedral_phi(dih)
        out["dihedral"] = float(np.sum(
            np.asarray(s.dihedral_k, np.float64)
            * (1.0 + np.cos(np.asarray(s.dihedral_n, np.float64) * phi
                            - np.asarray(s.dihedral_phase, np.float64)))))
    else:
        out["dihedral"] = 0.0
    imp = np.asarray(s.impropers)
    if imp.size:
        phi = dihedral_phi(imp)
        out["improper"] = float(np.sum(
            np.asarray(s.improper_k, np.float64) * (1.0 - np.cos(2.0 * phi))))
    else:
        out["improper"] = 0.0

    # ---- Drude springs (incl. anisotropy) ----
    dp = np.asarray(s.drude_pairs)
    e_dr = 0.0
    if dp.size:
        k3 = np.asarray(s.drude_k3, np.float64)
        k1 = np.asarray(s.drude_k1, np.float64)
        k2 = np.asarray(s.drude_k2, np.float64)
        aniso = np.asarray(s.drude_aniso)
        disp = minimum_image(pos[dp[:, 0]] - pos[dp[:, 1]], box)
        e_dr += float(np.sum(0.5 * k3 * np.sum(disp * disp, 1)))
        for i in range(len(dp)):
            if aniso[i, 0] < 0:
                continue
            u1 = minimum_image(pos[aniso[i, 1]] - pos[aniso[i, 0]], box)
            u1 /= np.linalg.norm(u1)
            u2 = minimum_image(pos[aniso[i, 3]] - pos[aniso[i, 2]], box)
            u2 /= np.linalg.norm(u2)
            d1 = disp[i] @ u1
            d2 = disp[i] @ u2
            e_dr += 0.5 * k1[i] * d1 * d1 + 0.5 * k2[i] * d2 * d2
    out["drude"] = e_dr

    # ---- Thole screened dipoles ----
    ts_ = np.asarray(s.thole_sites)
    e_th = 0.0
    if ts_.size:
        qq = np.asarray(s.thole_qq, np.float64)
        sc = np.asarray(s.thole_screen, np.float64)
        for a, b, sgn in ((0, 2, 1.0), (0, 3, -1.0), (1, 2, -1.0),
                          (1, 3, 1.0)):
            d = minimum_image(pos[ts_[:, a]] - pos[ts_[:, b]], box)
            r = np.linalg.norm(d, axis=1)
            u = sc * r
            e_th += float(np.sum(ONE_4PI_EPS0 * sgn * qq / r
                                 * (1.0 - (1.0 + 0.5 * u) * np.exp(-u))))
    out["thole"] = e_th

    # ---- 1-4 exceptions ----
    exc_idx = np.asarray(s.exc_idx)
    e_xc = e_xl = 0.0
    if exc_idx.size:
        qqs = np.asarray(s.exc_qq, np.float64)
        c6s = np.asarray(s.exc_c6, np.float64)
        c12s = np.asarray(s.exc_c12, np.float64)
        for i in range(n):
            for k in range(exc_idx.shape[1]):
                j = exc_idx[i, k]
                if j < 0 or j <= i:
                    continue
                if (qqs[i, k] == 0.0 and c6s[i, k] == 0.0
                        and c12s[i, k] == 0.0):
                    continue          # pure exclusion (may sit at r = 0)
                d = minimum_image(pos[i] - pos[j], box)
                r = math.sqrt(float(d @ d))
                e_xc += qqs[i, k] / r
                e_xl += c12s[i, k] / r ** 12 - c6s[i, k] / r ** 6
    out["exception_coul"] = e_xc
    out["exception_lj"] = e_xl

    # ---- nonbonded: LJ + Ewald (direct, exclusion corr, self, recip) ----
    q = np.asarray(s.charges, np.float64)
    lj_t = np.asarray(s.lj_type)
    acoef = np.asarray(s.acoef, np.float64)
    bcoef = np.asarray(s.bcoef, np.float64)
    lj_g = np.asarray(s.lj_group)
    allowed = np.asarray(s.lj_group_allowed)
    rc = float(s.r_cutoff)
    beta = float(s.ewald_beta)
    excl_sets = [set() for _ in range(n)]
    exl = np.asarray(s.exclusions)
    for i in range(n):
        for j in exl[i]:
            if j >= 0:
                excl_sets[i].add(int(j))
    erfc = np.vectorize(math.erfc)
    e_lj = e_cd = e_corr = 0.0
    B = 512
    for i0 in range(0, n, B):
        blk = slice(i0, min(i0 + B, n))
        d = minimum_image(pos[blk, None, :] - pos[None, :, :], box)
        r2 = np.sum(d * d, -1)
        ii = np.arange(i0, min(i0 + B, n))
        excl = np.zeros((len(ii), n), bool)
        for row, i in enumerate(ii):
            if excl_sets[i]:
                excl[row, sorted(excl_sets[i])] = True
        self_m = np.zeros((len(ii), n), bool)
        self_m[np.arange(len(ii)), ii] = True
        r = np.sqrt(np.maximum(r2, 1e-300))
        in_r = (~excl) & (~self_m) & (r < rc)
        a = acoef[lj_t[ii]][:, lj_t]
        b = bcoef[lj_t[ii]][:, lj_t]
        if allowed.shape[0] > 1:
            ok = allowed[lj_g[ii]][:, lj_g]
            a = np.where(ok, a, 0.0)
            b = np.where(ok, b, 0.0)
        inv6 = 1.0 / r ** 6
        e_lj += 0.5 * float(np.sum(np.where(in_r,
                                            (a * inv6) ** 2 * r ** 6 * inv6
                                            - b * inv6, 0.0)))
        qq = ONE_4PI_EPS0 * q[ii][:, None] * q[None, :]
        e_cd += 0.5 * float(np.sum(np.where(in_r, qq * erfc(beta * r) / r,
                                            0.0)))
        corr_m = excl & (~self_m)
        ef = np.vectorize(math.erf)
        e_corr += 0.5 * float(np.sum(np.where(corr_m,
                                              -qq * ef(beta * r) / r, 0.0)))
    out["lj"] = e_lj
    out["coul_direct"] = e_cd
    out["coul_excl_corr"] = e_corr
    vol = float(np.prod(box))
    out["coul_self"] = float(
        -beta / math.sqrt(math.pi) * ONE_4PI_EPS0 * np.sum(q * q)
        - ONE_4PI_EPS0 * math.pi / (2.0 * beta * beta * vol)
        * float(np.sum(q)) ** 2)

    # reciprocal: full complex k-space sum
    kmax = s.kmax
    e_rec = 0.0
    for nx in range(-kmax[0], kmax[0] + 1):
        for ny in range(-kmax[1], kmax[1] + 1):
            for nz in range(-kmax[2], kmax[2] + 1):
                if nx == 0 and ny == 0 and nz == 0:
                    continue
                kv = 2.0 * math.pi * np.array(
                    [nx / box[0], ny / box[1], nz / box[2]])
                k2 = float(kv @ kv)
                sk = np.sum(q * np.exp(1j * pos @ kv))
                e_rec += (math.exp(-k2 / (4 * beta * beta)) / k2
                          * float(np.abs(sk) ** 2))
    out["coul_recip"] = ONE_4PI_EPS0 * 2.0 * math.pi / vol * e_rec

    # LJ long-range dispersion correction (OpenMM convention for the
    # tabulated (a/r^6)^2 - b/r^6 form): E = -2 pi N^2/(3 V rc^3) <b>
    # with the a^2/r^12 part integrating to +2 pi/(9 V rc^9) <a^2>
    out["lj_lrc"] = float(2.0 * math.pi / vol
                          * (float(s.disp_coef_a2) / (9.0 * rc ** 9)
                             - float(s.disp_coef_b) / (3.0 * rc ** 3)))

    # TT damping (CLPolCoulTT): donors vs dipole sites
    td = np.asarray(s.tt_donors)
    e_tt = 0.0
    if td.size:
        ttq = np.asarray(s.tt_charges, np.float64)
        mask = np.asarray(s.tt_dipole_mask)
        bpar = float(s.tt_b)
        ttc = float(s.tt_cutoff)
        sites = np.where(mask)[0]
        excl_d = [excl_sets[i] for i in range(n)]
        for i in td:
            d = minimum_image(pos[int(i)] - pos[sites], box)
            r = np.linalg.norm(d, axis=1)
            for jj, rr in zip(sites, r):
                if rr >= ttc or jj == i or int(jj) in excl_d[int(i)]:
                    continue
                u = bpar * rr
                damp = -(math.exp(-u)
                         * (1 + u + u * u / 2 + u ** 3 / 6 + u ** 4 / 24))
                e_tt += ONE_4PI_EPS0 * ttq[int(i)] * ttq[int(jj)] / rr * damp
    out["tt_damping"] = e_tt
    return out


# ====== independent parameter-assignment cross-check (VERDICT r3 #6) ======
# The oracle above re-derives every FORMULA, but it consumes the engine's
# parameter TABLES — a wrong-parameter bug (wildcard matching, unit factor,
# NBFIX selection) would cancel between the two sides.  The functions below
# close that hole: they parse the PSF/PRM TEXT with their own tiny parsers
# and re-derive the per-term parameters from the reference's documented
# assignment semantics (oplspsffile.py:628-692 lookups, :1296-1326 LJ
# tables, :1408-1427 1-4 exceptions, :1478-1517 Drude/Thole), then assert
# the built System's tables match.  Out of scope (documented): the
# exclusion-EXPANSION set itself (shared semantics would cancel anyway) —
# gross exclusion errors surface through NVE/thermostat physics tests.

def _psf_text(path):
    import re as _re
    sections, cur = {}, None
    for line in open(path):
        m = _re.match(r"\s*(\d+)\s*!(\w[\w ]*)", line)
        if m:
            cur = m.group(2).strip().split(":")[0]
            sections[cur] = (int(m.group(1)), [])
            continue
        if cur and line.strip():
            sections[cur][1].append(line)
    natom = sections["NATOM"][0]
    atoms = []     # (name, type, charge, mass, alpha, thole)
    for ln in sections["NATOM"][1][:natom]:
        w = ln.split()
        atoms.append((w[4], w[5], float(w[6]), float(w[7]),
                      float(w[9]) if len(w) > 9 else 0.0,
                      float(w[10]) if len(w) > 10 else 0.0))

    def ids(name, width):
        flat = [int(x) - 1 for ln in sections.get(name, (0, []))[1]
                for x in ln.split()]
        return [tuple(flat[width * k + t] for t in range(width))
                for k in range(len(flat) // width)]

    return atoms, {k: ids(k, w) for k, w in
                   (("NBOND", 2), ("NTHETA", 3), ("NPHI", 4),
                    ("NIMPHI", 4))}


def _prm_text(path):
    prm = {"bond": {}, "angle": {}, "ub": {}, "dih": {}, "imp": {},
           "nb": {}, "nbfix": {}}
    section = None
    skip = {"CUTNB", "CTOFNB", "CTONNB", "EPS", "E14FAC", "WMIN"}
    names = {"ATOMS", "BONDS", "ANGLES", "DIHEDRALS", "IMPROPER",
             "IMPROPERS", "NONBONDED", "NBFIX", "NBTHOLE", "CMAP",
             "HBOND", "END"}
    for raw in open(path):
        line = raw.split("!")[0].strip()
        if not line or line.startswith("*"):
            continue
        w = line.split()
        u = w[0].upper()
        if u in names or u.startswith("NONB"):
            section = "NONBONDED" if u.startswith("NONB") else u
            continue
        if u in skip:
            continue
        if section == "BONDS":
            prm["bond"][(min(w[0], w[1]), max(w[0], w[1]))] = \
                (float(w[2]), float(w[3]))
        elif section == "ANGLES":
            key = (min(w[0], w[2]), w[1], max(w[0], w[2]))
            prm["angle"][key] = (float(w[3]), float(w[4]))
            if len(w) >= 7:
                prm["ub"][key] = (float(w[5]), float(w[6]))
        elif section == "DIHEDRALS":
            key = min((w[0], w[1], w[2], w[3]), (w[3], w[2], w[1], w[0]))
            terms = prm["dih"].setdefault(key, {})
            terms[int(w[5])] = (float(w[4]), float(w[6]))  # n -> (K, delta)
        elif section in ("IMPROPER", "IMPROPERS"):
            key = min((w[0], w[1], w[2], w[3]), (w[3], w[2], w[1], w[0]))
            prm["imp"][key] = float(w[4])
        elif section == "NONBONDED":
            eps14 = abs(float(w[5])) if len(w) >= 7 else abs(float(w[2]))
            r14 = float(w[6]) if len(w) >= 7 else float(w[3])
            prm["nb"][w[0]] = (abs(float(w[2])), float(w[3]), eps14, r14)
        elif section == "NBFIX":
            prm["nbfix"][(min(w[0], w[1]), max(w[0], w[1]))] = \
                (abs(float(w[2])), float(w[3]))
    return prm


def independent_assignment_check(model_dir, system):
    """Raise AssertionError if any engine parameter table disagrees with
    the independent text-level re-derivation."""
    s = system
    atoms, terms = _psf_text(os.path.join(model_dir, "topol.psf"))
    prm = _prm_text(os.path.join(model_dir, "ff.prm"))
    kcal = 4.184
    n = len(atoms)
    name = [a[0] for a in atoms]
    typ = [a[1] for a in atoms]
    q = np.array([a[2] for a in atoms])
    m = np.array([a[3] for a in atoms])

    def close(a, b, what, tol=1e-5):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        bad = np.abs(a - b) > tol * np.maximum(1.0, np.abs(b))
        assert not bad.any(), f"{what}: {int(bad.sum())} mismatches " \
            f"(first: got {a[bad][:3]}, want {b[bad][:3]})"

    close(np.asarray(s.charges)[:n], q, "charges")
    close(np.asarray(s.masses)[:n], m, "masses")

    real_bonds = [(i, j) for (i, j) in terms["NBOND"]
                  if name[i][0] != "D" and name[j][0] != "D"
                  and not name[i].startswith("LP") and name[i] != "OM"
                  and not name[j].startswith("LP") and name[j] != "OM"]

    # bonds: ALL real bonds keep spring terms — flexibleConstraints=True is
    # the build default (oplspsffile.py:1000-1008), so HBond-constrained
    # bonds carry their K/b0 alongside the constraint
    want = {}
    for (i, j) in real_bonds:
        kb, b0 = prm["bond"][(min(typ[i], typ[j]), max(typ[i], typ[j]))]
        want[(min(i, j), max(i, j))] = (2 * kb * kcal / 0.01, b0 * 0.1)
    got = {}
    bonds = np.asarray(s.bonds)
    for r in range(bonds.shape[0]):
        i, j = int(bonds[r, 0]), int(bonds[r, 1])
        got[(min(i, j), max(i, j))] = (float(np.asarray(s.bond_k)[r]),
                                       float(np.asarray(s.bond_r0)[r]))
    assert set(got) == set(want), "bond set differs"
    for k in want:
        close(got[k], want[k], f"bond {k}")

    # angles + UB
    want_a, want_u = {}, {}
    for (i, j, k3) in terms["NTHETA"]:
        key = (min(typ[i], typ[k3]), typ[j], max(typ[i], typ[k3]))
        ka, th0 = prm["angle"][key]
        want_a[(i, j, k3)] = (2 * ka * kcal, math.radians(th0))
        if key in prm["ub"]:
            kub, s0 = prm["ub"][key]
            want_u[(min(i, k3), max(i, k3))] = (2 * kub * kcal / 0.01,
                                                s0 * 0.1)
    ang = np.asarray(s.angles)
    got_a = {}
    for r in range(ang.shape[0]):
        i, j, k3 = (int(x) for x in ang[r])
        key = (i, j, k3) if (i, j, k3) in want_a else (k3, j, i)
        got_a[key] = (float(np.asarray(s.angle_k)[r]),
                      float(np.asarray(s.angle_theta0)[r]))
    assert set(got_a) == set(want_a), "angle set differs"
    for k in want_a:
        close(got_a[k], want_a[k], f"angle {k}")
    ub = np.asarray(s.ub_bonds)
    got_u = {(min(int(ub[r, 0]), int(ub[r, 1])),
              max(int(ub[r, 0]), int(ub[r, 1]))):
             (float(np.asarray(s.ub_k)[r]), float(np.asarray(s.ub_r0)[r]))
             for r in range(ub.shape[0])}
    assert set(got_u) == set(want_u), "urey-bradley set differs"
    for k in want_u:
        close(got_u[k], want_u[k], f"ub {k}")

    # dihedrals incl. the X-t2-t3-X wildcard fallback and the
    # same-multiplicity-replaces semantics
    want_d = {}
    for (i, j, k3, l) in terms["NPHI"]:
        key = min((typ[i], typ[j], typ[k3], typ[l]),
                  (typ[l], typ[k3], typ[j], typ[i]))
        if key not in prm["dih"]:
            key = min(("X", typ[j], typ[k3], "X"),
                      ("X", typ[k3], typ[j], "X"))
        for nn, (kchi, delta) in prm["dih"][key].items():
            want_d[(i, j, k3, l, nn)] = (kchi * kcal, math.radians(delta))
    dih = np.asarray(s.dihedrals)
    got_d = {}
    for r in range(dih.shape[0]):
        i, j, k3, l = (int(x) for x in dih[r])
        nn = int(np.asarray(s.dihedral_n)[r])
        key = (i, j, k3, l, nn) if (i, j, k3, l, nn) in want_d \
            else (l, k3, j, i, nn)
        got_d[key] = (float(np.asarray(s.dihedral_k)[r]),
                      float(np.asarray(s.dihedral_phase)[r]))
    assert set(got_d) == set(want_d), (
        f"dihedral term set differs ({len(got_d)} vs {len(want_d)})")
    for k in want_d:
        close(got_d[k], want_d[k], f"dihedral {k}")

    # impropers: exact then sorted-anchor wildcard; engine reorders rows to
    # (atom2, atom3, atom1, atom4)
    want_i = {}
    for (i, j, k3, l) in terms["NIMPHI"]:
        key = min((typ[i], typ[j], typ[k3], typ[l]),
                  (typ[l], typ[k3], typ[j], typ[i]))
        kpsi = prm["imp"].get(key)
        if kpsi is None:
            for anchor in (typ[j], typ[k3], typ[l]):
                wkey = tuple(sorted([typ[i], anchor, "X", "X"]))
                if wkey in prm["imp"]:
                    kpsi = prm["imp"][wkey]
                    break
        assert kpsi is not None, f"no improper params for {(i, j, k3, l)}"
        want_i[(j, k3, i, l)] = kpsi * kcal
    imp = np.asarray(s.impropers)
    got_i = {tuple(int(x) for x in imp[r]):
             float(np.asarray(s.improper_k)[r]) for r in range(imp.shape[0])}
    assert set(got_i) == set(want_i), "improper set differs"
    for k in want_i:
        close(got_i[k], want_i[k], f"improper {k}")

    # LJ tables: geometric rule with NBFIX overrides, E = (a/r6)^2 - b/r6
    typenames = sorted(set(typ))
    T = len(typenames)
    acoef = np.zeros((T, T))
    bcoef = np.zeros((T, T))
    for ti, t1 in enumerate(typenames):
        for tj, t2 in enumerate(typenames):
            fix = prm["nbfix"].get((min(t1, t2), max(t1, t2)))
            if fix is not None:
                w = fix[0] * kcal
                rij = fix[1] * 0.1
            else:
                w = math.sqrt(prm["nb"][t1][0] * prm["nb"][t2][0]) * kcal
                rij = math.sqrt(prm["nb"][t1][1] * prm["nb"][t2][1]) * 0.2
            acoef[ti, tj] = math.sqrt(w) * rij ** 6
            bcoef[ti, tj] = 2 * w * rij ** 6
    close(np.asarray(s.acoef)[:T, :T], acoef, "acoef", tol=1e-4)
    close(np.asarray(s.bcoef)[:T, :T], bcoef, "bcoef", tol=1e-4)

    # regular 1-4 exceptions: pair set from the real-atom bond graph, qq =
    # C q1 q4 / 2, LJ from the 1-4 columns (rmin14/2 geometric)
    partners = {}
    for (i, j) in real_bonds:
        partners.setdefault(i, set()).add(j)
        partners.setdefault(j, set()).add(i)
    p12 = set((min(i, j), max(i, j)) for i, j in real_bonds)
    p13 = set()
    for (a2, a3) in real_bonds:
        for a1 in partners.get(a2, ()):
            if a1 != a3:
                p13.add((min(a1, a3), max(a1, a3)))
        for a4 in partners.get(a3, ()):
            if a4 != a2:
                p13.add((min(a2, a4), max(a2, a4)))
    p14 = set()
    for (a2, a3) in real_bonds:
        for a1 in partners.get(a2, ()):
            for a4 in partners.get(a3, ()):
                if a1 != a3 and a2 != a4 and a1 != a4:
                    p14.add((min(a1, a4), max(a1, a4)))
    p13 -= p12
    p14 -= p13 | p12
    exc_idx = np.asarray(s.exc_idx)
    exc_qq = np.asarray(s.exc_qq)
    exc_c6 = np.asarray(s.exc_c6)
    exc_c12 = np.asarray(s.exc_c12)
    got_e = {}
    for i in range(exc_idx.shape[0]):
        for c in range(exc_idx.shape[1]):
            j = int(exc_idx[i, c])
            if j >= 0 and j > i:
                got_e[(i, j)] = (float(exc_qq[i, c]), float(exc_c6[i, c]),
                                 float(exc_c12[i, c]))
    missing = p14 - set(got_e)
    assert not missing, f"{len(missing)} 1-4 pairs missing from exc tables"
    for (i, j) in sorted(p14):
        eps = math.sqrt(prm["nb"][typ[i]][2] * prm["nb"][typ[j]][2]) * kcal
        sig = math.sqrt(prm["nb"][typ[i]][3] * 2 * prm["nb"][typ[j]][3]
                        * 2) * 0.1 * 2 ** (-1.0 / 6.0)
        want_q = ONE_4PI_EPS0 * q[i] * q[j] / 2.0
        close(got_e[(i, j)],
              (want_q, 4 * eps * sig ** 6, 4 * eps * sig ** 12),
              f"1-4 exception {(i, j)}", tol=1e-4)

    # Drude isotropic springs k = C q_d^2 / alpha (alpha column, A^3 -> nm^3)
    dp = np.asarray(s.drude_pairs)
    aniso = np.asarray(s.drude_aniso)
    alpha_col = np.array([a[4] for a in atoms])
    for r in range(dp.shape[0]):
        if aniso.shape[0] and aniso[r, 0] >= 0:
            continue                      # anisotropic solving out of scope
        d, p = int(dp[r, 0]), int(dp[r, 1])
        alpha = -alpha_col[p] * 1e-3
        close(float(np.asarray(s.drude_k3)[r]),
              ONE_4PI_EPS0 * q[d] * q[d] / alpha, f"drude k3 {(d, p)}")

    # Thole screened pairs: 1-2/1-3 parent pairs that both carry Drudes,
    # screen = (t1 + t2) / (alpha1 alpha2)^(1/6)
    drude_of = {}
    for (i, j) in terms["NBOND"]:
        if name[j][0] == "D":
            drude_of[i] = j
        elif name[i][0] == "D":
            drude_of[j] = i
    thole_col = np.array([a[5] for a in atoms])
    want_t = {}
    for (i, j) in sorted(p12 | p13):
        if i in drude_of and j in drude_of:
            a1 = -alpha_col[i] * 1e-3
            a2 = -alpha_col[j] * 1e-3
            scr = (thole_col[i] + thole_col[j]) / (a1 * a2) ** (1.0 / 6.0)
            want_t[frozenset((drude_of[i], drude_of[j]))] = \
                (q[drude_of[i]] * q[drude_of[j]], scr)
    ts = np.asarray(s.thole_sites)
    got_t = {frozenset((int(ts[r, 0]), int(ts[r, 2]))):
             (float(np.asarray(s.thole_qq)[r]),
              float(np.asarray(s.thole_screen)[r]))
             for r in range(ts.shape[0])}
    assert set(got_t) == set(want_t), (
        f"thole pair set differs ({len(got_t)} vs {len(want_t)})")
    for k in want_t:
        close(got_t[k], want_t[k], "thole pair")

    return {"bonds": len(want), "angles": len(want_a),
            "dihedral_terms": len(want_d), "impropers": len(want_i),
            "exc14": len(p14), "drude": int(dp.shape[0]),
            "thole": len(want_t)}


def main():
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

    models = sys.argv[1:] or ["bulk_Im21"]
    os.makedirs("tests/golden", exist_ok=True)
    for model in models:
        d = f"/root/reference/examples/models/{model}/"
        gro = GroFile(d + "conf.gro")
        psf = OplsPsfFile(d + "topol.psf",
                          periodicBoxVectors=gro.getPeriodicBoxVectors())
        prm = CharmmParameterSet(d + "ff.prm")
        built = psf.createSystem(prm, nonbondedCutoff=1.2,
                                 constraints="HBonds", rigidWater=True)
        counts = independent_assignment_check(d, built.system)
        print(f"  assignment cross-check OK: {counts}")
        g = golden_energies(built.system, gro.positions, gro.box)
        path = f"tests/golden/{model}.json"
        with open(path, "w") as f:
            json.dump(g, f, indent=1, sort_keys=True)
        print(path)
        for k, v in sorted(g.items()):
            print(f"  {k:16s} {v:16.3f}")


if __name__ == "__main__":
    main()
