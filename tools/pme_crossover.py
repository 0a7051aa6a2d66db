#!/usr/bin/env python3
"""Measure the exact-k vs FFT-PME reciprocal crossover on device.

VERDICT r4 #4: either PME beats exact-k at some measured N, or exact-k is
documented as the production reciprocal at all bundled scales with the
scaling argument written down.  This times energy+forces (value_and_grad,
the engine's actual usage) for:

  * exact      — ops/ewald.py matmul k-sum
  * exact_fused— ops/ewald_pallas.py Pallas kernel
  * pme        — ops/pme.py scatter spreading
  * pme_binned — ops/pme.py z-plane binned-matmul spreading

over synthetic neutral random-charge boxes at ionic-liquid density
(~47 atoms/nm^3), cubic, with kmax from the same 5e-4 Ewald error
criterion production uses.  Writes results/pme_crossover_r5.json.

Usage: python tools/pme_crossover.py [sizes...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def kmax_for(box, beta, tol=5e-4):
    """Same criterion as the engine: exp(-k^2/4b^2)/k^2 cut at tol."""
    ks = []
    for L in box:
        k = 1
        while True:
            kv = 2 * np.pi * k / L
            if np.exp(-(kv / (2 * beta)) ** 2) < tol:
                break
            k += 1
        ks.append(k)
    return tuple(ks)


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [19968, 39936, 79872, 159744]
    import jax
    import jax.numpy as jnp
    from openmm_velocityverlet_tpu.ops import ewald, ewald_pallas, pme

    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        L = (n / 47.0) ** (1.0 / 3.0)
        box = np.array([L, L, L], np.float32)
        pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
        q = rng.normal(0, 0.5, n).astype(np.float32)
        q -= q.mean()
        beta = 3.12 / 1.2  # rc=1.2 nm, OpenMM default error criterion
        kmax = kmax_for(box, beta)
        grid = pme.choose_grid(box)
        m_per_plane = int(n / grid[2] * 3.0)  # 3x mean occupancy headroom
        row = {"n": n, "box_nm": round(L, 2), "kmax": kmax,
               "grid": grid, "K_half_modes":
               int(np.prod([2 * k + 1 for k in kmax[:2]]) * (kmax[2] + 1))}

        def time_fn(f, reps=20):
            g = jax.jit(jax.value_and_grad(f))
            e, fr = g(jnp.asarray(pos))
            jax.block_until_ready(fr)
            t0 = time.time()
            for _ in range(reps):
                e, fr = g(jnp.asarray(pos))
            jax.block_until_ready(fr)
            return (time.time() - t0) / reps * 1e3, float(e)

        bj = jnp.asarray(box)
        qj = jnp.asarray(q)
        try:
            # chunk=4096: production's atom-chunked remat path (forces.py
            # passes ewald_chunk); the unchunked variant materializes a
            # (n, 2AB) HBM intermediate that reaches GBs at cubic-box kmax
            row["exact_ms"], e0 = time_fn(
                lambda p: ewald.reciprocal_energy(p, bj, qj, beta, kmax,
                                                  chunk=4096))
            row["exact_E"] = e0
        except Exception as ex:
            row["exact_ms"] = f"failed: {type(ex).__name__}"
        if n <= 40000:
            # the flattened-K Pallas kernel is O(N*K) transcendentals —
            # known uncompetitive (see ewald_pallas.FUSED_AUTO); include
            # only at small N for the record
            try:
                row["exact_fused_ms"], e1 = time_fn(
                    lambda p: ewald_pallas.reciprocal_energy_fused(
                        p, bj, qj, beta, kmax, 256))
                row["exact_fused_E"] = e1
            except Exception as ex:
                row["exact_fused_ms"] = f"failed: {type(ex).__name__}"
        try:
            row["pme_scatter_ms"], e2 = time_fn(
                lambda p: pme.reciprocal_energy_pme(p, bj, qj, beta, grid))
            row["pme_E"] = e2
        except Exception as ex:
            row["pme_scatter_ms"] = f"failed: {type(ex).__name__}"
        try:
            row["pme_binned_ms"], e3 = time_fn(
                lambda p: pme.reciprocal_energy_pme(
                    p, bj, qj, beta, grid, bin_cap=m_per_plane))
            row["pme_binned_E"] = e3
            row["bin_cap"] = m_per_plane
        except Exception as ex:
            row["pme_binned_ms"] = f"failed: {type(ex).__name__}"
        rows.append(row)
        print(json.dumps(row))

    out = {"platform": jax.devices()[0].platform, "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "pme_crossover_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
