from . import bonded, constraints, drude, ewald, external, nonbonded, vsites
