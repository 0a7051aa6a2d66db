"""Reconstruction of the reference's real EDL datasets (stripped PSFs).

The edl_* models ship without topol.psf; tools/reconstruct_edl_psf.py
rebuilds them from conf.gro + ff.prm + the bulk residue templates.  These
tests lock the geometric conventions the reconstruction rests on and that
the result drives the full createSystem path with every parameter
resolved.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

MODELS = "/root/reference/examples/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(MODELS),
                                reason="reference data absent")


def test_edl_gro_conventions():
    """The pairing/order conventions the reconstruction (and run-edl's
    zip(group_ils, group_img)) rely on: i-th IMG mirrors i-th IL atom."""
    import reconstruct_edl_psf as r
    res_ids, res_names, names, pos, box = r.read_gro(
        os.path.join(MODELS, "edl_Im21", "conf.gro"))
    res = np.asarray(res_names)
    mos = res == "MoS2"
    img = res == "IMG"
    ils = ~mos & ~img
    lz = box[2]
    d = pos[img][:, 2] - (lz - pos[ils][:, 2])
    d -= np.round(d / lz) * lz
    # conf.gro has 3 decimals and the reference randomizes by <=1e-3 nm
    assert np.abs(d).max() < 0.02
    dxy = pos[img][:, :2] - pos[ils][:, :2]
    dxy -= np.round(dxy / box[:2]) * box[:2]
    assert np.abs(dxy).max() < 0.02


def test_mos2_topology_inference():
    import reconstruct_edl_psf as r
    res_ids, res_names, names, pos, box = r.read_gro(
        os.path.join(MODELS, "edl_Im21", "conf.gro"))
    sel = [i for i, rn in enumerate(res_names) if rn == "MoS2"][:624]
    bonds, angles = r.mos2_topology(pos[sel], [names[i] for i in sel], box)
    nm = np.asarray([names[i] for i in sel])
    n_mo = int((nm == "Mo").sum())
    n_s = int((nm == "S").sum())
    assert n_mo == 208 and n_s == 416
    # every Mo binds 6 S, every S binds 3 Mo
    assert len(bonds) == 6 * n_mo == 3 * n_s
    # 3 Mo-S-Mo per S + 9 (of 15) near-83.8deg S-Mo-S per Mo
    assert len(angles) == 3 * n_s + 9 * n_mo


def test_reconstructed_psf_builds_system(tmp_path):
    import reconstruct_edl_psf as r
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

    out = str(tmp_path / "topol.psf")
    r.reconstruct("edl_Im21", out)
    d = os.path.join(MODELS, "edl_Im21")
    gro = GroFile(os.path.join(d, "conf.gro"))
    psf = OplsPsfFile(out, periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(os.path.join(d, "ff.prm"))
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    s = built.system
    top = built.topology
    assert s.n_atoms == 40310
    mos = top.select_by_residue_name("MoS2")
    img = top.select_by_residue_name("IMG")
    ils = top.select_by_residue_name("MoS2", "IMG", invert=True)
    assert (len(mos), len(img), len(ils)) == (2496, 18907, 18907)
    # images are massless, chargeless placeholders (charges assigned -q by
    # run-edl at setup; ff.prm ATOMS: MASS 16 IMG 0.0)
    q = np.asarray(s.charges)
    m = np.asarray(s.masses)
    assert np.abs(q[img]).max() == 0.0 and np.abs(m[img]).max() == 0.0
    # electrode neutral, liquid neutral to PSF rounding
    assert abs(q[mos].sum()) == 0.0
    assert abs(q[ils].sum()) < 0.01
    # Drude machinery lifted intact from the bulk templates:
    # c2c1im has 8 Drude particles, dca 5 -> 511*(8+5)
    assert s.drude_pairs.shape[0] == 511 * 13
    # HBond constraints: c2c1im has 11 H
    assert s.constraints.shape[0] == 511 * 11
    # every parameter resolved (createSystem would have raised otherwise);
    # spot-check the electrode bond/angle parameters landed
    bonds = np.asarray(s.bonds)
    mos_set = set(mos)
    mos_bonds = [k for k in range(bonds.shape[0])
                 if int(bonds[k, 0]) in mos_set]
    assert len(mos_bonds) == 4 * 1248          # 6 per Mo, 208 Mo, 4 slabs
    k_bond = np.asarray(s.bond_k)[mos_bonds]
    np.testing.assert_allclose(k_bond, 2 * 51.422084 * 4.184 / 0.01,
                               rtol=1e-5)


@pytest.mark.parametrize("model", ["edl_Im81", "edl_ImB1", "edl_ImO1"])
def test_other_edl_models_reconstruct_and_build(model, tmp_path):
    """The remaining three EDL datasets reconstruct and drive createSystem
    with every parameter resolved (lighter checks than edl_Im21)."""
    import reconstruct_edl_psf as r
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

    out = str(tmp_path / "topol.psf")
    r.reconstruct(model, out)
    d = os.path.join(MODELS, model)
    gro = GroFile(os.path.join(d, "conf.gro"))
    psf = OplsPsfFile(out, periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(os.path.join(d, "ff.prm"))
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    s = built.system
    assert s.n_atoms == len(gro.positions)
    top = built.topology
    img = top.select_by_residue_name("IMG")
    ils = top.select_by_residue_name("MoS2", "IMG", invert=True)
    assert len(img) == len(ils)
    q = np.asarray(s.charges)
    assert abs(q.sum()) < 0.01 and s.is_drude


def test_run_edl_wiring_on_real_dataset(tmp_path, monkeypatch):
    """run-edl.py's full wiring on the REAL reconstructed edl_Im21: exact
    image-charge bookkeeping, Langevin electrode + TGNH liquid partition,
    E-field on the electrolyte, and the reference's DOF accounting
    (TG_DRUDE = 3*pairs, TG_COM = 3*ion-molecules - 3 for CMMotion; the
    18907 massless images and ghost-free molecules add nothing)."""
    import importlib.util

    import reconstruct_edl_psf as r
    out = str(tmp_path / "topol.psf")
    r.reconstruct("edl_Im21", out)
    spec = importlib.util.spec_from_file_location(
        "runedl", os.path.join(os.path.dirname(__file__), "..",
                               "examples", "run-edl.py"))
    runedl = importlib.util.module_from_spec(spec)
    argv = sys.argv
    sys.argv = ["run-edl.py"]
    spec.loader.exec_module(runedl)
    sys.argv = argv
    monkeypatch.chdir(tmp_path)
    d = os.path.join(MODELS, "edl_Im21") + "/"
    sim = runedl.gen_simulation(d + "conf.gro", out, d + "ff.prm",
                                voltage=1.0)
    ctx = sim.context
    q = np.asarray(ctx.system.charges)
    data = ctx.data
    pairs = np.asarray(data.image_pairs)
    assert pairs.shape == (18907, 2)
    assert float(data.mirror_location) == 8.0
    np.testing.assert_allclose(q[pairs[:, 0]].sum(),
                               -q[pairs[:, 1]].sum(), atol=1e-6)
    assert data.ld_normal.shape[0] == 2496 and data.ld_pairs.shape[0] == 0
    assert data.nh_pairs.shape[0] == 6643
    assert data.nh_normal.shape[0] == 18907 - 2 * 6643
    dof = np.asarray(data.temp_group_dof)
    assert dof[2] == 3 * 6643                 # TG_DRUDE
    assert dof[1] == 3 * 1022 - 3             # TG_COM (ions - CMMotion)
    assert data.electrolyte.shape[0] == 18907
    assert float(data.electric_field) > 0
