"""openmm_velocityverlet_tpu — a standalone TPU-native MD engine with the
capabilities of the openmm-velocityVerlet plugin (and the OpenMM facilities
its workloads depend on), built on JAX/XLA.

Public API mirrors the reference layers:
* VVIntegrator / Context  — integrator + context (L2/L1 of SURVEY.md)
* SystemBuilder, loaders  — ommhelper system construction (L4)
* Simulation + reporters  — app layer driving the workloads (L5)
"""
import os as _os

import jax as _jax

# Persistent XLA compilation cache: the fused MD step is a single large
# program (~8 min cold compile for a 20k-atom system through a remote TPU);
# caching it makes every rerun of an unchanged binary start in seconds.
# Opt out with JAX_COMPILATION_CACHE_DIR="" in the environment.
if ("JAX_COMPILATION_CACHE_DIR" not in _os.environ
        and _jax.config.jax_compilation_cache_dir is None):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/ommvv_tpu_xla"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from .system import System, State, make_state
from .context import Context
from .forces import ForceEvaluator
from .integrators.vv import VVIntegrator
from .integrators.barostat import BarostatConfig
from .models.builder import SystemBuilder
from . import app

__version__ = "0.1.0"

__all__ = ["System", "State", "make_state", "Context", "ForceEvaluator",
           "VVIntegrator", "BarostatConfig", "SystemBuilder", "app"]
