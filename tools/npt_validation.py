#!/usr/bin/env python3
"""ns-scale NPT validation run: bulk_Im21, TGNH @ 333 K, iso MC barostat
@ 1 bar, dt = 1 fs (VERDICT round-1 item 7).

Reports T_atom/T_COM/T_drude (DrudeTemperatureReporter math) and density
every 10 ps; expects density to equilibrate to a stable value and the
temperature partition to hold (T_COM/T_atom ~ 333 K, T_drude ~ 1 K).

Usage: nohup python tools/npt_validation.py [n_ps] > /tmp/npt.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    n_ps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from openmm_velocityverlet_tpu import Context, VVIntegrator
    from openmm_velocityverlet_tpu.integrators.barostat import BarostatConfig
    from openmm_velocityverlet_tpu.models.grofile import GroFile
    from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
    from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile
    from openmm_velocityverlet_tpu.units import BOLTZ

    d = "/root/reference/examples/models/bulk_Im21/"
    gro = GroFile(d + "conf.gro")
    psf = OplsPsfFile(d + "topol.psf",
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(d + "ff.prm")
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True)
    system = built.system

    integ = VVIntegrator(333.0, 10.0, 1.0, 40.0, 0.001)
    integ.setMaxDrudeDistance(0.02)
    baro = BarostatConfig(kind="iso", pressure=1.0, temperature=333.0,
                          frequency=25)
    ctx = Context(system, integ, positions=gro.positions, box=gro.box,
                  barostat=baro)
    ctx.set_velocities_to_temperature(333.0)

    m = np.asarray(system.masses)
    total_mass_g = float(m.sum()) / 6.02214076e23
    dp = np.asarray(system.drude_pairs)
    m1, m2 = m[dp[:, 0]], m[dp[:, 1]]
    mu = m1 * m2 / (m1 + m2)
    mol_id = np.asarray(system.particle_mol_id)
    mol_m = np.asarray(system.mol_masses)

    def report():
        vel = ctx.get_velocities()
        box = ctx.get_box()
        vol_cm3 = float(np.prod(box)) * 1e-21
        rho = total_mass_g / vol_cm3
        # DrudeTemperatureReporter partition (reference oracle math,
        # drudetemperaturereporter.py:96-133)
        mom = np.zeros((mol_m.shape[0], 3))
        np.add.at(mom, mol_id, m[:, None] * vel)
        vcom = mom / np.maximum(mol_m[:, None], 1e-30)
        ke_com = 0.5 * np.sum(mol_m * np.sum(vcom ** 2, -1))
        t_com = 2 * ke_com / (3 * mol_m.shape[0] * BOLTZ)
        vrel_all = vel - vcom[mol_id]
        rel = vrel_all[dp[:, 0]] - vrel_all[dp[:, 1]]
        ke_dr = 0.5 * np.sum(mu[:, None] * rel * rel)
        t_dr = 2 * ke_dr / (3 * dp.shape[0] * BOLTZ)
        # atomic DOF relative to COM, with pair-COM replacing pair members
        ke_tot = float(0.5 * np.sum(m[:, None] * vrel_all ** 2))
        ke_atom = ke_tot - ke_dr
        n_massive = int((m > 0).sum())
        dof_atom = (3 * n_massive - 3 * mol_m.shape[0]
                    - 3 * dp.shape[0] - system.constraints.shape[0])
        t_atom = 2 * ke_atom / (dof_atom * BOLTZ)
        return rho, t_com, t_atom, t_dr, box

    t0 = time.time()
    print(f"atoms={system.n_atoms} start", flush=True)
    for ps in range(10, n_ps + 1, 10):
        ctx.step(10000)
        jax.block_until_ready(ctx._carry.state.pos)
        rho, t_com, t_atom, t_dr, box = report()
        rate = ps / (time.time() - t0) * 86.4  # ns/day
        print(f"t={ps:6.0f} ps  rho={rho:7.4f} g/mL  T_com={t_com:6.1f} "
              f"T_atom={t_atom:6.1f} T_drude={t_dr:6.2f}  "
              f"Lz={float(box[2]):.4f}  [{rate:.1f} ns/day]", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
