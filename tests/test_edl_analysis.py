"""Pipeline validation for the constant-voltage Poisson analysis
(edl_analysis.py) on analytic fixtures — VERDICT r4 item #2a: prove the
histogram->cumsum->phi code recovers known potentials before trusting it
on MD output."""
import numpy as np
import pytest

from openmm_velocityverlet_tpu import edl_analysis as ea

LZ = 16.0
NBIN = 320
V = 1.0


def _sheet_rho(sheets):
    """Charge density from (z, sigma e/nm^2) surface-charge sheets."""
    rho = np.zeros(NBIN)
    dz = LZ / NBIN
    for z, sig in sheets:
        rho[int(z / dz) % NBIN] += sig / dz
    return rho


def test_vacuum_capacitor_recovers_applied_drop():
    prof = ea.poisson_profile(np.zeros(NBIN), LZ, V)
    assert prof["drop_V"] == pytest.approx(V, abs=1e-12)
    assert prof["drop_induced_V"] == pytest.approx(0.0, abs=1e-12)


def test_image_symmetric_sheets_leave_drop_at_applied():
    # liquid dipole layer (+s at z1, -s at z2) plus its exact images
    # across the mirror m = LZ/2: the induced drop between the conductor
    # planes must vanish identically (image antisymmetry theorem).
    m = LZ / 2
    z1, z2, s = 1.525, 6.475, 0.37
    sheets = [(z1, s), (z2, -s), (2 * m - z1, -s), (2 * m - z2, s)]
    rho = _sheet_rho(sheets)
    assert ea.antisymmetry_residual(rho) < 1e-12
    prof = ea.poisson_profile(rho, LZ, V)
    assert prof["drop_V"] == pytest.approx(V, abs=1e-9)
    assert prof["drop_induced_V"] == pytest.approx(0.0, abs=1e-9)


def test_unmirrored_charge_breaks_the_drop():
    # teeth: without images the induced part does NOT cancel
    rho = _sheet_rho([(1.525, 0.37), (6.475, -0.37)])
    prof = ea.poisson_profile(rho, LZ, V)
    assert abs(prof["drop_V"] - V) > 0.5
    assert ea.antisymmetry_residual(rho) > 0.5


def test_capacitance_estimators_on_analytic_edl():
    # idealized EDL: counter-charge sheet -s a gap g past each conductor
    # plane (and image-symmetric partners).  Plate charge from the
    # two-grounded-planes Green's function: Q0/A = sum q_i z_i / d.
    m = LZ / 2
    g, s = 0.425, 0.3
    z1, z2 = g, m - g
    sheets = [(z1, -s), (z2, s), (2 * m - z1, s), (2 * m - z2, -s)]
    rho = _sheet_rho(sheets)
    prof = ea.poisson_profile(rho, LZ, V)
    assert prof["drop_V"] == pytest.approx(V, abs=1e-9)

    # dipole estimator on the liquid-half point charges
    pos_z = np.array([z1, z2])
    q = np.array([-s, s])  # per unit area (area=1)
    sigma_dip, cap_dip = ea.capacitance_dipole(
        pos_z, q, np.ones(2, bool), m, V, area=1.0)
    assert sigma_dip == pytest.approx(s * (z2 - z1) / m, rel=1e-12)

    # plane-field estimator must agree: E(0+) = sigma_plate/EPS0 + E_app
    # contribution already folded into e_tot; the induced plate charge
    # equals sigma_dip + EPS0*E_app (the vacuum-capacitor part)
    sigma_plane, cap_plane = ea.capacitance_plane_field(prof, V)
    sigma_expected = sigma_dip + ea.EPS0 * 2 * V / LZ
    assert sigma_plane == pytest.approx(sigma_expected, rel=1e-6)
