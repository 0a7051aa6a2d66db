"""MD unit system and physical constants.

The engine works internally in the OpenMM MD unit system (the same system the
reference plugin uses, see /root/reference/openmmapi/src/VVIntegrator.cpp:40
`SimTKOpenMMRealType.h` BOLTZ usage):

* length      : nanometer (nm)
* time        : picosecond (ps)
* mass        : dalton (g/mol)
* energy      : kilojoule/mole (kJ/mol)
* charge      : elementary charge (e)
* temperature : kelvin (K)

Derived: velocity nm/ps, force kJ/mol/nm, frequency 1/ps.
"""

# Molar gas constant in kJ/mol/K ("BOLTZ" in OpenMM's SimTKOpenMMRealType.h,
# used by the reference for kT in the NH chain, VVIntegrator.cpp:371).
BOLTZ = 8.31446261815324e-3

# Coulomb constant 1/(4 pi eps0) in kJ*nm/mol/e^2
# (reference: examples/ommhelper/util.py:10 CONST.ONE_4PI_EPS0).
ONE_4PI_EPS0 = 138.935456

# Avogadro constant, 1/mol. Used to convert kJ/(nm e) -> kJ/(mol nm e) for the
# external electric field (reference: CudaVVKernels.cpp:978).
AVOGADRO = 6.02214076e23

# 1 volt/nm expressed in the integrator's internal E-field unit kJ/(nm e)
# (reference: VVIntegrator.h:283-296 documents 1 V/nm = 1.60217662e-22 kJ/(nm e)).
VOLT_PER_NM = 1.602176634e-22

# Unit conversion helpers (CHARMM parameter files use kcal/mol and Angstrom).
KCAL_TO_KJ = 4.184
ANGSTROM_TO_NM = 0.1
DEGREE_TO_RAD = 3.14159265358979323846 / 180.0

PI = 3.14159265358979323846

# Pressure: bar -> kJ/mol/nm^3 (for MC barostat acceptance, PV term).
# 1 bar = 1e5 Pa = 1e5 J/m^3 = 1e5 * 1e-27 kJ/nm^3 * AVOGADRO / 1000 (J->kJ)
# = 0.0602214076 kJ/mol/nm^3
BAR_TO_KJ_MOL_NM3 = 0.06022140760

# ns/day for a given steps/s and dt (ps):  steps_per_s * dt_ps * 1e-3 * 86400
def ns_per_day(steps_per_second: float, dt_ps: float) -> float:
    return steps_per_second * dt_ps * 1e-3 * 86400.0
