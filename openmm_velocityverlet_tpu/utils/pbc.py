"""Periodic-boundary-condition math for orthorhombic boxes.

All bundled reference workloads use rectangular boxes (conf.gro footers carry
only diagonal box vectors), so the engine supports orthorhombic PBC.  Triclinic
support can be layered on later without changing call sites (box is always a
(3,) diagonal vector here).
"""
from __future__ import annotations

import jax.numpy as jnp


def minimum_image(dr: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Wrap displacement vectors into the minimum image convention.

    dr : (..., 3) displacement(s)
    box: (3,) orthorhombic box lengths
    """
    return dr - box * jnp.round(dr / box)


def wrap_positions(pos: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Wrap positions into [0, box)."""
    return pos - box * jnp.floor(pos / box)


def distance2(dr: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(dr * dr, axis=-1)
