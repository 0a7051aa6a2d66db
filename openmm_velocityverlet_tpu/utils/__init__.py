from . import pbc
