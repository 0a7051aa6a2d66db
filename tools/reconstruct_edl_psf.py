#!/usr/bin/env python3
"""Reconstruct the stripped EDL topol.psf files from conf.gro + ff.prm +
the bulk models' residue templates.

The reference ships its four edl_* datasets without topol.psf (stripped
large blobs, examples/models/.MISSING_LARGE_BLOBS).  Everything needed to
rebuild them is present:

* the ionic-liquid species are exactly the bulk models' residues (same
  force field, same mstools generator) — their per-residue atom records,
  bonds, angles, dihedrals and impropers lift verbatim from the matching
  bulk topol.psf as offset templates;
* the MoS2 electrode topology is inferable from geometry + ff.prm: Mo-S
  bonds at r0 = 2.41 A (measured lattice distance 2.365 A; next shell
  3.94 A), Mo-S-Mo angles (3 per S, all at 83.8 deg = the MoS-SMo-MoS
  type) and the 9-of-15 S-Mo-S pairs per Mo that sit at ~83.8 deg (the
  SMo-MoS-SMo type; the other 6 sit at ~136 deg, for which ff.prm carries
  no type — including them would strain the lattice away from its own
  minimum, so the generator evidently skipped them);
* IMG particles are massless single-atom residues of type IMG (ff.prm
  ATOMS: "MASS 16 IMG 0.0000") whose charges run-edl.py overwrites with
  -q_parent at setup;
* pairing/order conventions verified directly against conf.gro: the i-th
  IMG mirrors the i-th ionic-liquid atom (z_img = 2*(Lz/2) - z_parent to
  gro precision), electrodes are 4 bonded trilayer residues of 624 atoms.

Usage:
  python tools/reconstruct_edl_psf.py edl_Im21 [out_psf]
  python tools/reconstruct_edl_psf.py all            # all four models

Writes /tmp/edl_real/<model>/topol.psf by default (the reference tree is
read-only) and prints a reconstruction summary.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODELS = "/root/reference/examples/models"
PAIRING = {"edl_Im21": "bulk_Im21", "edl_Im81": "bulk_Im81",
           "edl_ImB1": "bulk_ImB1", "edl_ImO1": "bulk_ImO1"}
MO_S_BOND_NM = 0.30        # bond cutoff (measured 0.2365, next shell 0.394)
SMOS_ANGLE_MAX_DEG = 110.0  # keep ~83.8 deg S-Mo-S pairs, drop ~136 deg


def parse_psf_sections(path):
    sections = {}
    cur = None
    for line in open(path):
        m = re.match(r"\s*(\d+)\s*!(\w[\w ]*)", line)
        if m:
            cur = m.group(2).strip().split(":")[0]
            sections[cur] = (int(m.group(1)), [])
            continue
        if cur and line.strip():
            sections[cur][1].append(line.rstrip("\n"))
    return sections


def extract_templates(bulk_psf):
    """Per-residue-species templates from a bulk PSF: atom records and
    term tuples as offsets relative to the residue's first atom."""
    sec = parse_psf_sections(bulk_psf)
    natom = sec["NATOM"][0]
    atoms = []   # (resid, resname, name, type, charge, mass, alpha, thole)
    for ln in sec["NATOM"][1][:natom]:
        w = ln.split()
        atoms.append((int(re.sub(r"\D", "", w[2])), w[3], w[4], w[5],
                      float(w[6]), float(w[7]), float(w[9]), float(w[10])))

    # residue spans in file order
    spans = []
    start = 0
    for i in range(1, natom + 1):
        if i == natom or atoms[i][0] != atoms[start][0]:
            spans.append((atoms[start][1], start, i))
            start = i

    def ints(name):
        if name not in sec:
            return []
        return [int(x) for ln in sec[name][1] for x in ln.split()]

    terms = {k: np.array(ints(k), int).reshape(-1, w) - 1
             for k, w in (("NBOND", 2), ("NTHETA", 3), ("NPHI", 4),
                          ("NIMPHI", 4)) if ints(k)}

    templates = {}
    for resname, a, b in spans:
        if resname in templates:
            continue
        t = {"atoms": [x[2:] for x in atoms[a:b]], "n": b - a}
        for key, tab in terms.items():
            inside = np.all((tab >= a) & (tab < b), axis=1)
            touching = np.any((tab >= a) & (tab < b), axis=1)
            if np.any(touching & ~inside):
                raise ValueError(f"{resname}: term crosses residue boundary")
            t[key] = (tab[inside] - a).tolist()
        templates[resname] = t
    return templates


def read_gro(path):
    lines = open(path).read().splitlines()
    n = int(lines[1])
    box = np.array([float(x) for x in lines[2 + n].split()[:3]])
    res_ids, res_names, names, pos = [], [], [], np.zeros((n, 3))
    for i, ln in enumerate(lines[2:2 + n]):
        res_ids.append(int(ln[0:5]))
        res_names.append(ln[5:10].strip())
        names.append(ln[10:15].strip())
        pos[i] = [float(ln[20:28]), float(ln[28:36]), float(ln[36:44])]
    return res_ids, res_names, names, pos, box


def mos2_topology(pos, names, box):
    """Bonds + angles for one MoS2 trilayer residue (local indices)."""
    names = np.asarray(names)
    mo = np.where(names == "Mo")[0]
    s = np.where(names == "S")[0]
    d = pos[mo][:, None, :] - pos[s][None, :, :]
    d -= np.round(d / box) * box
    r = np.sqrt((d ** 2).sum(-1))
    adj = r < MO_S_BOND_NM
    bonds = [(int(mo[i]), int(s[j]))
             for i, j in zip(*np.where(adj))]

    def ang(p0, pc, p1):
        v1 = pos[p0] - pos[pc]
        v1 -= np.round(v1 / box) * box
        v2 = pos[p1] - pos[pc]
        v2 -= np.round(v2 / box) * box
        c = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
        return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))

    angles = []
    for j, sj in enumerate(s):        # Mo-S-Mo, center S: all (3 per S)
        nb = mo[adj[:, j]]
        for a in range(len(nb)):
            for b in range(a + 1, len(nb)):
                angles.append((int(nb[a]), int(sj), int(nb[b])))
    for i, mi in enumerate(mo):       # S-Mo-S, center Mo: ~83.8 deg only
        nb = s[adj[i]]
        for a in range(len(nb)):
            for b in range(a + 1, len(nb)):
                if ang(nb[a], mi, nb[b]) < SMOS_ANGLE_MAX_DEG:
                    angles.append((int(nb[a]), int(mi), int(nb[b])))
    return bonds, angles


def reconstruct(model, out_psf=None):
    edl_dir = os.path.join(MODELS, model)
    bulk_dir = os.path.join(MODELS, PAIRING[model])
    out_psf = out_psf or f"/tmp/edl_real/{model}/topol.psf"
    os.makedirs(os.path.dirname(out_psf), exist_ok=True)

    templates = extract_templates(os.path.join(bulk_dir, "topol.psf"))
    res_ids, res_names, names, pos, box = read_gro(
        os.path.join(edl_dir, "conf.gro"))
    n = len(names)

    # gro truncates residue names to 5 chars; map back to PSF names
    by_prefix = {k[:5]: k for k in templates}

    atoms_out = []    # (segid, resid, resname, name, type, q, m, alpha, thole)
    bonds, angles, dihedrals, impropers = [], [], [], []
    i = 0
    res_counter = 0
    counts = {}
    while i < n:
        rid = res_ids[i]
        j = i
        while j < n and res_ids[j] == rid and res_names[j] == res_names[i]:
            j += 1
        rn = res_names[i]
        res_counter += 1
        counts[rn] = counts.get(rn, 0) + 1
        if rn == "MoS2":
            rb, ra = mos2_topology(pos[i:j], names[i:j], box)
            for k in range(i, j):
                t = ("MoS", 95.9370) if names[k] == "Mo" else ("SMo", 32.0640)
                atoms_out.append(("S", res_counter, "MoS2", names[k], t[0],
                                  0.0, t[1], 0.0, 0.0))
            bonds += [(i + a, i + b) for a, b in rb]
            angles += [(i + a, i + c, i + b) for a, c, b in ra]
        elif rn == "IMG":
            assert j == i + 1, "IMG residues are single particles"
            atoms_out.append(("S", res_counter, "IMG", "I", "IMG",
                              0.0, 0.0, 0.0, 0.0))
        else:
            full = by_prefix.get(rn[:5])
            if full is None:
                raise ValueError(f"no bulk template for residue {rn!r}")
            t = templates[full]
            if j - i != t["n"]:
                raise ValueError(
                    f"{rn}: gro residue has {j - i} atoms, template "
                    f"{full} has {t['n']}")
            for k, (aname, atype, q, m, alpha, thole) in zip(
                    range(i, j), t["atoms"]):
                # gro writes PSF atom names with trailing digits stripped
                # (bulk pair verified: N1 -> N, DP14 -> DP, ...)
                if names[k] != re.sub(r"\d+$", "", aname):
                    raise ValueError(
                        f"{full} atom {k - i}: gro name {names[k]!r} != "
                        f"template {aname!r}")
                atoms_out.append(("S", res_counter, full, aname, atype,
                                  q, m, alpha, thole))
            bonds += [(i + a, i + b) for a, b in t.get("NBOND", [])]
            angles += [(i + a, i + b, i + c)
                       for a, b, c in t.get("NTHETA", [])]
            dihedrals += [(i + a, i + b, i + c, i + d)
                          for a, b, c, d in t.get("NPHI", [])]
            impropers += [(i + a, i + b, i + c, i + d)
                          for a, b, c, d in t.get("NIMPHI", [])]
        i = j

    with open(out_psf, "w") as f:
        f.write("PSF DRUDE\n\n")
        f.write("       1 !NTITLE\n")
        f.write(" REMARKS topol.psf reconstructed from conf.gro + ff.prm + "
                f"{PAIRING[model]} templates (tools/reconstruct_edl_psf.py)\n")
        f.write(f"\n{len(atoms_out):8d} !NATOM\n")
        for k, (seg, rid, rn, aname, atype, q, m, al, th) in \
                enumerate(atoms_out):
            f.write(f"{k + 1:8d}  {seg:<4s}{rid:<7d}{rn:<9s}{aname:>7s}"
                    f"{atype:>9s} {q:10.6f}{m:9.4f}{0:5d}{al:9.4f}"
                    f"{th:9.4f}\n")

        def section(name, rows, width):
            f.write(f"\n{len(rows):8d} !{name}\n")
            flat = [x + 1 for row in rows for x in row]
            per = 24 // width * width
            for a in range(0, len(flat), per):
                f.write("".join(f"{x:8d}" for x in flat[a:a + per]) + "\n")

        section("NBOND: bonds", bonds, 2)
        section("NTHETA: angles", angles, 3)
        section("NPHI: dihedrals", dihedrals, 4)
        section("NIMPHI: impropers", impropers, 4)
        f.write(f"\n{0:8d} !NDON: donors\n")
        f.write(f"\n{0:8d} !NACC: acceptors\n")
        f.write(f"\n{0:8d} !NNB\n\n")
        f.write(f"\n{0:8d} !NUMANISO\n\n")

    print(f"{model}: {len(atoms_out)} atoms, {len(bonds)} bonds, "
          f"{len(angles)} angles, {len(dihedrals)} dihedrals, "
          f"{len(impropers)} impropers -> {out_psf}")
    print(f"  residues: " + "  ".join(f"{k} x{v}" for k, v in counts.items()))
    return out_psf


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    if arg == "all":
        for m in PAIRING:
            reconstruct(m)
    else:
        reconstruct(arg, out)
