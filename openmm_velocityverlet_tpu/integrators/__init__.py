from . import barostat, nhchain, stepping, vv
