from .builder import SystemBuilder
