"""Nose-Hoover chain propagation, on device.

Scalar-for-scalar the same update as the reference's host-side fp64 routine
``VVIntegrator::propagateNHChain`` (VVIntegrator.cpp:340-376), but vectorized
over the temperature groups (TG_ATOM/TG_COM/TG_DRUDE) and executed inside the
fused step — eliminating the per-step GPU->host KE download + host chain
update + factor upload round-trip the reference performs every step
(CudaVVKernels.cpp:709-746), which is its single biggest serialization point.

Chain length and loop count are static Python ints, so the loops unroll into
a handful of fused scalar ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..units import BOLTZ


def propagate_nh_chains(eta, eta_dot, eta_dotdot, eta_mass, ke2, ke2_target,
                        t_target, dt, num_chains: int, loops_per_step: int):
    """Advance all chains one thermostat interval; return updated state and
    per-group velocity scale factors.

    eta, eta_dotdot, eta_mass : (G, C) ; eta_dot : (G, C+1)
    ke2, ke2_target, t_target : (G,)   (ke2 = 2*KE of the group)
    """
    dt2 = dt / loops_per_step / 2.0
    dt4 = dt2 / 2.0
    dt8 = dt4 / 2.0
    G, C = eta.shape
    # work on per-chain column lists to keep indexing static
    eta = [eta[:, i] for i in range(C)]
    eta_dot = [eta_dot[:, i] for i in range(C + 1)]
    eta_dotdot = [eta_dotdot[:, i] for i in range(C)]
    q0 = eta_mass[:, 0]
    q0_safe = jnp.where(q0 > 0, q0, 1.0)
    eta_mass = jnp.where(eta_mass > 0, eta_mass, 1.0)

    factor = jnp.ones_like(ke2)
    eta_dotdot[0] = (ke2 - ke2_target) / q0_safe
    for _ in range(loops_per_step):
        expfac = None
        for ich in range(num_chains - 1, -1, -1):
            expfac = jnp.exp(-dt8 * eta_dot[ich + 1])
            eta_dot[ich] = (eta_dot[ich] * expfac + eta_dotdot[ich] * dt4) * expfac
        factor = factor * jnp.exp(-dt2 * eta_dot[0])
        for ich in range(num_chains):
            eta[ich] = eta[ich] + dt2 * eta_dot[ich]
        eta_dotdot[0] = (ke2 * factor * factor - ke2_target) / q0_safe
        # the reference reuses the last expfac of the downward sweep here
        # (VVIntegrator.cpp:364), i.e. exp(-dt8 * eta_dot[1]) as updated above
        eta_dot[0] = (eta_dot[0] * expfac + eta_dotdot[0] * dt4) * expfac
        for ich in range(1, num_chains):
            expfac = jnp.exp(-dt8 * eta_dot[ich + 1])
            eta_dotdot[ich] = (eta_mass[:, ich - 1] * eta_dot[ich - 1] ** 2
                               - BOLTZ * t_target) / eta_mass[:, ich]
            eta_dot[ich] = (eta_dot[ich] * expfac + eta_dotdot[ich] * dt4) * expfac

    # groups with zero chain mass are not thermostated (CudaVVKernels.cpp:729):
    # their factor stays 1 and their chain state stays untouched.
    active = q0 > 0
    factor = jnp.where(active, factor, 1.0)
    return (jnp.where(active[:, None], jnp.stack(eta, 1), 0.0),
            jnp.where(active[:, None], jnp.stack(eta_dot, 1), 0.0),
            jnp.where(active[:, None], jnp.stack(eta_dotdot, 1), 0.0),
            factor)
