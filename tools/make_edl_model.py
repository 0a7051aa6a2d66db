#!/usr/bin/env python3
"""Synthesize a constant-voltage EDL model at the reference's scale.

The reference's edl_* datasets ship without topol.psf (stripped large blobs,
examples/models/.MISSING_LARGE_BLOBS), so an EDL-scale run needs a
synthesized system.  This tool builds one from bundled parts, as text files
(conf.gro + topol.psf + ff.prm) that run-edl.py consumes unchanged:

* liquid: bulk_Im21's CLPol ionic liquid replicated twice along z
  (18,500 atoms, all Drude machinery intact), residues as in the bulk PSF;
* electrodes: MoS2-like 3-layer slabs (residue MoS2) at BOTH image planes
  — the doubled-cell mirror construction puts image planes at z = Lz/2 (the
  mirror) and, through the periodic wrap, at z = 0.  Each slab's surface
  layer sits exactly on its image plane, so the explicit electrode LJ keeps
  the liquid from collapsing onto its own images (the image attraction has
  no repulsive core of its own).  Slabs are restrained + Langevin-
  thermostated by run-edl.py;
* images: one massless IMG particle per liquid atom (charges are assigned
  as -q_parent by run-edl.py's assign_image_charges) at z' = 2*mirror - z;
  they overlap the electrode slabs — "inside the conductor", with img<->mos
  LJ removed by the interaction groups and zero electrode charges.

Geometry: liquid occupies z in [0.35, Lz/2 - 0.35] between the two slab
surfaces; the image region fills the upper half of the doubled box.

Usage: python tools/make_edl_model.py [outdir] [nres]
(default /tmp/edl_model, full liquid; nres limits the number of liquid
residues per copy for small test systems)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SRC = "/root/reference/examples/models/bulk_Im21/"


def parse_psf(path):
    lines = open(path).read().splitlines()
    atoms = []
    ints = {}
    cur = None
    for ln in lines[1:]:
        if "!" in ln:
            head, _, tag = ln.partition("!")
            tag = tag.split(":")[0].strip()
            cur = tag
            ints[tag] = []
            continue
        if not ln.strip() or cur is None or cur == "NTITLE":
            continue
        if cur == "NATOM":
            atoms.append(ln.split())
        else:
            ints[cur].extend(int(x) for x in ln.split())
    return atoms, ints


def parse_gro(path):
    lines = open(path).read().splitlines()
    n = int(lines[1])
    pos = np.array([[float(lines[2 + i][20:28]), float(lines[2 + i][28:36]),
                     float(lines[2 + i][36:44])] for i in range(n)])
    box = np.array([float(x) for x in lines[2 + n].split()[:3]])
    return lines[2:2 + n], pos, box


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edl_model"
    nres = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    os.makedirs(out, exist_ok=True)
    atoms, ints = parse_psf(SRC + "topol.psf")
    gro_lines, pos, box = parse_gro(SRC + "conf.gro")

    if nres:
        # residue-aligned subset for small test systems: residues are
        # contiguous atom ranges and no bonded term crosses residues
        keep_res = sorted({int(w[2]) for w in atoms})[:nres]
        keep = np.asarray([int(w[2]) in keep_res for w in atoms])
        new_id = np.cumsum(keep)            # 1-based for kept atoms
        atoms = [list(w) for w, k in zip(atoms, keep) if k]
        for i, w in enumerate(atoms):
            w[0] = str(i + 1)
        pos = pos[keep]
        for name, per in (("NBOND", 2), ("NTHETA", 3), ("NPHI", 4),
                          ("NIMPHI", 4)):
            vals = ints.get(name, [])
            outv = []
            for t in range(0, len(vals), per):
                grp = vals[t:t + per]
                if all(keep[v - 1] for v in grp):
                    outv.extend(int(new_id[v - 1]) for v in grp)
            ints[name] = outv

    n_liq0 = len(atoms)
    lz0 = box[2]

    # wrap molecules (PSF residues) into [0, lz0) along z by their center,
    # keeping each molecule whole: the bulk gro stores unwrapped molecules,
    # which would overlap the electrode/mirror once copies are stacked
    resids = np.asarray([int(w[2]) for w in atoms])
    for r in np.unique(resids):
        sel = resids == r
        zc = pos[sel, 2].mean()
        pos[sel, 2] -= np.floor(zc / lz0) * lz0

    # ---- liquid: two z-copies ----
    all_atoms = []
    max_resid = 0
    for copy in range(2):
        for w in atoms:
            w2 = list(w)
            w2[0] = str(len(all_atoms) + 1)
            w2[2] = str(int(w[2]) + copy * 10000)
            all_atoms.append(w2)
            max_resid = max(max_resid, int(w2[2]))
    n_liq = len(all_atoms)
    liq_pos = np.concatenate([pos, pos + [0, 0, lz0]])

    def dup_ints(name, k):
        vals = ints.get(name, [])
        outv = list(vals)
        outv += [v + n_liq0 for v in vals]
        return outv

    bonds = dup_ints("NBOND", 2)
    angles = dup_ints("NTHETA", 3)
    dihs = dup_ints("NPHI", 4)
    imps = dup_ints("NIMPHI", 4)

    # ---- electrode slabs (MoS2-like, 3 layers at both image planes) ----
    h_liq = 2 * lz0
    liq_shift = 0.35
    liq_pos = liq_pos + [0.0, 0.0, liq_shift]
    nxy = int(round(box[0] / 0.31))
    mirror = liq_shift + h_liq + 0.35
    lz_total = 2.0 * mirror
    # surface layers exactly on the image planes (z = 0 wraps; z = mirror)
    layer_z = [0.0, -0.31, -0.62, mirror, mirror + 0.31, mirror + 0.62]
    elec_pos = []
    elec_types = []
    for li, zz in enumerate(layer_z):
        t = "S2E" if li % 3 == 0 else ("MO2" if li % 3 == 1 else "S2E")
        for ix in range(nxy):
            for iy in range(nxy):
                elec_pos.append([(ix + 0.5 * (li % 2)) * box[0] / nxy,
                                 (iy + 0.5 * (li % 2)) * box[1] / nxy,
                                 zz % lz_total])
                elec_types.append(t)
    elec_pos = np.asarray(elec_pos)
    resid = max_resid + 1
    for k, t in enumerate(elec_types):
        mass = 95.95 if t == "MO2" else 32.06
        all_atoms.append([str(len(all_atoms) + 1), "E", str(resid), "MoS2",
                          f"{'MO' if t == 'MO2' else 'S'}{k}", t,
                          "0.000000", f"{mass:.4f}", "0", "-0.0000",
                          "0.0000"])
    n_elec = len(elec_types)

    # ---- image particles (one per liquid atom, massless) ----
    img_pos = liq_pos.copy()
    img_pos[:, 2] = 2.0 * mirror - img_pos[:, 2]
    resid += 1
    for k in range(n_liq):
        all_atoms.append([str(len(all_atoms) + 1), "I", str(resid), "IMG",
                          f"IP{k}", "IP_", "0.000000", "0.0000", "0",
                          "-0.0000", "0.0000"])

    n_total = len(all_atoms)
    all_pos = np.concatenate([liq_pos, elec_pos, img_pos])

    # ---- write PSF ----
    with open(os.path.join(out, "topol.psf"), "w") as f:
        f.write("PSF DRUDE\n\n       1 !NTITLE\n"
                " REMARKS synthesized EDL model (tools/make_edl_model.py)\n\n")
        f.write(f"{n_total:8d} !NATOM\n")
        for w in all_atoms:
            f.write("  %6s %-4s %-6s %-8s %-8s %-6s %10s %9s %4s %9s %9s\n"
                    % tuple(w))

        def sect(name, vals, per):
            f.write(f"\n{len(vals) // per:8d} !{name}\n")
            for i in range(0, len(vals), 8):
                f.write("".join(f"{v:8d}" for v in vals[i:i + 8]) + "\n")

        sect("NBOND: bonds", bonds, 2)
        sect("NTHETA: angles", angles, 3)
        sect("NPHI: dihedrals", dihs, 4)
        sect("NIMPHI: impropers", imps, 4)
        f.write(f"\n{0:8d} !NUMANISO\n")

    # ---- write GRO ----
    with open(os.path.join(out, "conf.gro"), "w") as f:
        f.write("synthesized EDL model\n")
        f.write(f"{n_total:5d}\n")
        for i, w in enumerate(all_atoms):
            resi = int(w[2]) % 100000
            f.write("%5d%-5s%5s%5d%8.3f%8.3f%8.3f\n"
                    % (resi, w[3][:5], w[4][:5], (i + 1) % 100000,
                       all_pos[i, 0], all_pos[i, 1], all_pos[i, 2]))
        f.write(f" {box[0]:.4f} {box[1]:.4f} {lz_total:.4f}\n")

    # ---- write PRM (bulk ff + electrode/image types) ----
    prm = open(SRC + "ff.prm").read()
    extra = """
ATOMS
  MASS     90        MO2    95.9500
  MASS     91        S2E    32.0600
  MASS     92        IP_     0.0000

NONBONDED
        MO2      0.0  -0.0135     1.3700
        S2E      0.0  -0.3000     1.5500
        IP_      0.0  -0.0000     0.0000

END
"""
    with open(os.path.join(out, "ff.prm"), "w") as f:
        f.write(prm.replace("\nEND", "") + extra)

    print(f"wrote {out}: atoms={n_total} (liquid {n_liq}, electrode "
          f"{n_elec}, images {n_liq}); box {box[0]:.2f} x {box[1]:.2f} x "
          f"{lz_total:.2f} nm, mirror at {mirror:.3f}")


if __name__ == "__main__":
    main()
