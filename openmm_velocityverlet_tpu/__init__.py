"""openmm_velocityverlet_tpu — a standalone TPU-native MD engine with the
capabilities of the openmm-velocityVerlet plugin (and the OpenMM facilities
its workloads depend on), built on JAX/XLA.

Public API mirrors the reference layers:
* VVIntegrator / Context  — integrator + context (L2/L1 of SURVEY.md)
* SystemBuilder, loaders  — ommhelper system construction (L4)
* Simulation + reporters  — app layer driving the workloads (L5)
"""
from .system import System, State, make_state
from .context import Context, enable_compilation_cache
from .forces import ForceEvaluator
from .integrators.vv import VVIntegrator
from .integrators.barostat import BarostatConfig
from .models.builder import SystemBuilder
from . import app

__version__ = "0.1.0"

__all__ = ["System", "State", "make_state", "Context", "ForceEvaluator",
           "VVIntegrator", "BarostatConfig", "SystemBuilder", "app",
           "enable_compilation_cache"]
