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
        g = golden_energies(built.system, gro.positions, gro.box)
        path = f"tests/golden/{model}.json"
        with open(path, "w") as f:
            json.dump(g, f, indent=1, sort_keys=True)
        print(path)
        for k, v in sorted(g.items()):
            print(f"  {k:16s} {v:16.3f}")


if __name__ == "__main__":
    main()
