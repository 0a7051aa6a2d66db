"""Exactness of the image-charge mirror transform in the exact-k Ewald
reciprocal (ewald.reciprocal_energy mirror=...): the image block's structure
factor derived from the parents' by the static per-kz rotation must equal the
explicit 2N-atom evaluation — energy and REAL-atom forces to f32 rounding —
with the image-atom forces identically zero (the fixed-image convention:
explicit image forces are computed and discarded, imageCharge.cu:2-28)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openmm_velocityverlet_tpu.ops import ewald


def _mirrored_system(rng, n_el=40, n_liq=300, lz=8.0):
    box = np.array([3.1, 3.1, lz], np.float32)
    zm = 0.25 * lz
    pos_el = rng.uniform(0, 1, (n_el, 3)) * [3.1, 3.1, 0.4]
    pos_liq = rng.uniform(0, 1, (n_liq, 3)) * [3.1, 3.1, 2.8]
    pos_liq[:, 2] += 0.5
    q_el = rng.normal(0, 0.3, n_el)
    q_liq = rng.normal(0, 0.5, n_liq)
    pos_img = pos_liq.copy()
    pos_img[:, 2] = 2.0 * zm - pos_img[:, 2]
    pos = np.concatenate([pos_el, pos_liq, pos_img]).astype(np.float32)
    q = np.concatenate([q_el, q_liq, -q_liq]).astype(np.float32)
    mirror = (n_el + n_liq, n_el, n_liq, zm)
    return pos, q, box, mirror


@pytest.mark.parametrize("chunk", [0, 64])
def test_mirror_matches_explicit(chunk):
    rng = np.random.default_rng(7)
    pos, q, box, mirror = _mirrored_system(rng)
    beta, kmax = 2.2, (5, 5, 9)
    posj = jnp.asarray(pos)
    qj = jnp.asarray(q)
    boxj = jnp.asarray(box)

    def e_full(p):
        return ewald.reciprocal_energy(p, boxj, qj, beta, kmax, chunk=chunk,
                                       chunk_min_bytes=0.0)

    def e_mir(p):
        return ewald.reciprocal_energy(p, boxj, qj, beta, kmax, chunk=chunk,
                                       chunk_min_bytes=0.0, mirror=mirror)

    ef, gf = jax.value_and_grad(e_full)(posj)
    em, gm = jax.value_and_grad(e_mir)(posj)
    np.testing.assert_allclose(float(em), float(ef), rtol=2e-5)
    n_real = mirror[0]
    gf = np.asarray(gf)
    gm = np.asarray(gm)
    scale = np.abs(gf[:n_real]).max()
    np.testing.assert_allclose(gm[:n_real], gf[:n_real],
                               rtol=1e-4, atol=2e-4 * scale)
    # fixed-image convention: no gradient flows to the image block
    assert np.abs(gm[n_real:]).max() == 0.0


def test_mirror_image_block_consistency():
    """The mirror path must equal an explicit evaluation whose image
    positions are REGENERATED from the parents (the integrator's sync
    invariant), not merely the stored ones."""
    rng = np.random.default_rng(8)
    pos, q, box, mirror = _mirrored_system(rng)
    img0, par0, cnt, zm = mirror
    # perturb parents, then re-sync images the way the integrator does
    pos = pos.copy()
    pos[par0:par0 + cnt] += rng.normal(0, 0.01, (cnt, 3)).astype(np.float32)
    pos[img0:, :2] = pos[par0:par0 + cnt, :2]
    pos[img0:, 2] = 2.0 * zm - pos[par0:par0 + cnt, 2]
    beta, kmax = 2.2, (5, 5, 9)
    ef = ewald.reciprocal_energy(jnp.asarray(pos), jnp.asarray(box),
                                 jnp.asarray(q), beta, kmax)
    em = ewald.reciprocal_energy(jnp.asarray(pos), jnp.asarray(box),
                                 jnp.asarray(q), beta, kmax, mirror=mirror)
    np.testing.assert_allclose(float(em), float(ef), rtol=2e-5)
