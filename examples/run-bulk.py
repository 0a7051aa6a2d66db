#!/usr/bin/env python3
"""Bulk ionic-liquid workload — TPU port of the reference driver
(/root/reference/examples/run-bulk.py): NPT/NVT bulk CLPol simulation with
Langevin or (TG)NH thermostat, optional cosine acceleration for viscosity,
checkpoint restart, and the full reporter set."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openmm_velocityverlet_tpu import BarostatConfig, Context, VVIntegrator
from openmm_velocityverlet_tpu.app import (CheckpointReporter, DCDReporter,
                                           DrudeTemperatureReporter,
                                           GroReporter, Simulation,
                                           StateDataReporter,
                                           ViscosityReporter, load_checkpoint)
from openmm_velocityverlet_tpu.models.grofile import GroFile
from openmm_velocityverlet_tpu.models.helper import add_clpol_coul_tt
from openmm_velocityverlet_tpu.models.prmfile import CharmmParameterSet
from openmm_velocityverlet_tpu.models.psffile import OplsPsfFile

parser = argparse.ArgumentParser(
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("-n", "--nstep", type=int, default=int(1e6))
parser.add_argument("-t", "--temp", type=float, default=333)
parser.add_argument("-p", "--press", type=float, default=1)
parser.add_argument("--dt", type=float, default=0.001)
parser.add_argument("--thermostat", type=str, default="langevin",
                    choices=["langevin", "nose-hoover"])
parser.add_argument("--barostat", type=str, default="iso",
                    choices=["no", "iso", "semi-iso", "xyz", "xy", "z"])
parser.add_argument("--cos", type=float, default=0)
parser.add_argument("--gro", type=str, default="conf.gro")
parser.add_argument("--psf", type=str, default="topol.psf")
parser.add_argument("--prm", type=str, default="ff.prm")
parser.add_argument("--cpt", type=str)
parser.add_argument("--min", action="store_true")
parser.add_argument("--drude-friction", type=float, default=20.0,
                    help="Drude Langevin friction (1/ps); the reference "
                    "default is 20. 100 suppresses the kinetic T_Drude "
                    "discretization elevation at dt >= 1 fs")
parser.add_argument("--mesh", type=int, default=0,
                    help="shard the step over the first N devices "
                    "(jax.sharding.Mesh over the atom axis); 0 = single "
                    "device")


def gen_simulation(gro_file, psf_file, prm_file, dt=0.001, T=300, P=1,
                   tcoupl="langevin", pcoupl="iso", cos=0, restart=None,
                   mesh_devices=0):
    print("Building system...")
    gro = GroFile(gro_file)
    psf = OplsPsfFile(psf_file,
                      periodicBoxVectors=gro.getPeriodicBoxVectors())
    prm = CharmmParameterSet(prm_file)
    built = psf.createSystem(prm, nonbondedCutoff=1.2, constraints="HBonds",
                             rigidWater=True, verbose=True)
    is_drude = built.system.is_drude

    # TT damping between HO donors and Drude dipoles (run-bulk.py:39-44)
    donors = [a.idx for a in psf.atom_list if a.attype == "HO"]
    if is_drude and donors:
        print("Add TT damping between HO and Drude dipoles")
        add_clpol_coul_tt(built, donors)
        built.refinalize()

    print("Initializing simulation...")
    integrator = VVIntegrator(T, 10, 1, 40, dt)
    integrator.setUseMiddleScheme(True)
    integrator.setMaxDrudeDistance(0.02)
    if tcoupl == "langevin":
        # the reference uses OpenMM (Drude)LangevinIntegrator here; the TPU
        # engine provides the same physics through the partitioned-Langevin
        # path of the VV integrator applied to every particle
        if is_drude:
            integrator.setFriction(5.0)
            integrator.setDrudeFriction(args.drude_friction)
            print(f"Drude Langevin thermostat: 5.0 /ps, "
                  f"{args.drude_friction} /ps")
            if dt > 0.00075 and args.drude_friction < 50.0:
                # CLPol springs sit at omega*dt ~ 1 at 1 fs; the middle
                # scheme + exact OU map is stable there, but the KINETIC
                # temperature of the stiff relative DOF carries a
                # discretization elevation that shrinks with the Drude
                # friction (TPU spot-run on bulk_Im21, 20 ps: T_Drude 7 K at
                # the reference's 20/ps, 2.0 K at 100/ps).  Ensemble
                # observables (density, induced dipoles) are insensitive to
                # this choice — see tests/test_langevin_mts.py.
                print("WARNING: at dt >= 1 fs the kinetic T_Drude reads "
                      "~7 K at 20/ps from stiff-spring discretization; "
                      "pass --drude-friction 100 to suppress it "
                      "(configurational sampling is unaffected)")
        else:
            print("Langevin thermostat: 1.0 /ps")
            integrator.setFriction(1.0)
        for i in range(built.system.n_atoms):
            integrator.addParticleLangevin(i)
    elif tcoupl == "nose-hoover":
        if is_drude:
            print("Drude temperature-grouped Nose-Hoover thermostat: "
                  "10 /ps, 40 /ps")
        else:
            print("Nose-Hoover thermostat: 10 /ps")
    else:
        raise Exception("Available thermostat: langevin, nose-hoover")

    barostat = None
    if pcoupl != "no":
        barostat = BarostatConfig(kind=pcoupl, pressure=P, temperature=T)
    if cos != 0:
        integrator.setCosAcceleration(cos)

    mesh = None
    if mesh_devices:
        import jax

        from openmm_velocityverlet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:mesh_devices])
        print(f"Sharding over {mesh_devices} devices "
              f"({mesh.devices[0].platform})")
    ctx = Context(built.system, integrator, positions=gro.positions,
                  box=gro.box, barostat=barostat, mesh=mesh)
    sim = Simulation(built.topology, ctx)
    if restart:
        load_checkpoint(ctx, restart)
        append = True
    else:
        ctx.set_velocities_to_temperature(T)
        append = False

    sim.reporters.append(CheckpointReporter("cpt.cpt", 10000))
    sim.reporters.append(GroReporter("dump.gro", 1000, logarithm=True,
                                     append=append))
    sim.reporters.append(DCDReporter("dump.dcd", 10000, append=append))
    sim.reporters.append(StateDataReporter(sys.stdout, 1000, box=False,
                                           volume=True, append=append))
    if is_drude:
        sim.reporters.append(DrudeTemperatureReporter("T_drude.txt", 10000,
                                                      append=append))
    if cos != 0:
        sim.reporters.append(ViscosityReporter("viscosity.txt", 1000,
                                               append=append))
    return sim


if __name__ == "__main__":
    args = parser.parse_args()
    sim = gen_simulation(gro_file=args.gro, psf_file=args.psf,
                         prm_file=args.prm, dt=args.dt, T=args.temp,
                         P=args.press, tcoupl=args.thermostat,
                         pcoupl=args.barostat, cos=args.cos,
                         restart=args.cpt, mesh_devices=args.mesh)
    print("Running...")
    for g, e in sim.context.group_energies().items():
        print(f"E_{g}: {e:.4f} kJ/mol")
    if args.min:
        print("Minimized energy:", sim.minimize_energy(100))
    sim.step(args.nstep)
