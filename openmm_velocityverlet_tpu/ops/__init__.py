from . import bonded, constraints, drude, ewald, external, neighborlist, nonbonded, vsites
