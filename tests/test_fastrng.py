"""Statistical quality of the fast counter-hash RNG (ops/fastrng.py).

The fast stream replaces per-lane threefry for path sampling (BASELINE.md
"Roofline": raygen+RNG measured at ~44% of forward). These tests hold it
to the properties Monte-Carlo integration actually needs: marginal
uniformity, bitwise avalanche, and decorrelation across the structured
counter strides the integrator uses (adjacent pixels, slots, bounces).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.ops import fastrng

KEY = jax.random.PRNGKey(7)


def _u(n=1 << 15, nslot=8, key=KEY):
    tab = fastrng.seed_words(key, 4)
    return np.asarray(fastrng.uniforms(tab[2, 0], tab[2, 1],
                                       jnp.arange(n), nslot))


def test_range_and_uniformity():
    u = _u()
    assert (u >= 0).all() and (u < 1).all()
    # chi-square over 64 bins, all slots pooled
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = u.size / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # 63 dof: mean 63, std ~11.2 — generous 6-sigma gate
    assert chi2 < 63 + 6 * 11.2, chi2


def test_mean_and_moments():
    u = _u(1 << 16)
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs((u ** 2).mean() - 1 / 3) < 2e-3


def test_avalanche_adjacent_ids():
    """Flipping the lowest id bit should flip ~half the output bits."""
    tab = fastrng.seed_words(KEY, 1)
    ids = jnp.arange(0, 4096)
    a = fastrng.uniforms(tab[0, 0], tab[0, 1], ids, 1)[:, 0]
    bits_a = np.asarray((a * (1 << 24)).astype(np.uint32))
    flips = bits_a[0::2] ^ bits_a[1::2]   # id pairs differing in bit 0
    frac = np.unpackbits(flips.view(np.uint8)).mean() * 32 / 24
    assert 0.4 < frac < 0.6, frac


@pytest.mark.parametrize("stride", [1, 2, 512, 513])
def test_pixel_stride_correlation(stride):
    """Adjacent / row-adjacent pixel streams must be uncorrelated."""
    u = _u(1 << 14, nslot=2)[:, 0]
    x, y = u[:-stride], u[stride:]
    r = np.corrcoef(x, y)[0, 1]
    assert abs(r) < 0.03, (stride, r)


def test_slot_and_seed_decorrelation():
    """Same ids, different slots / different seed rows -> independent."""
    tab = fastrng.seed_words(KEY, 3)
    ids = jnp.arange(1 << 14)
    u = np.asarray(fastrng.uniforms(tab[0, 0], tab[0, 1], ids, 4))
    for a in range(4):
        for b in range(a + 1, 4):
            assert abs(np.corrcoef(u[:, a], u[:, b])[0, 1]) < 0.03
    v = np.asarray(fastrng.uniforms(tab[1, 0], tab[1, 1], ids, 4))
    assert abs(np.corrcoef(u[:, 0], v[:, 0])[0, 1]) < 0.03


def test_per_lane_seed_rows_match_scalar():
    """[R]-shaped seed words (wavefront path) == scalar rows (classic)."""
    tab = fastrng.seed_words(KEY, 8)
    ids = jnp.arange(100)
    rows = jnp.full((100,), 5)
    per_lane = fastrng.uniforms(tab[rows, 0], tab[rows, 1], ids, 3)
    scalar = fastrng.uniforms(tab[5, 0], tab[5, 1], ids, 3)
    np.testing.assert_array_equal(np.asarray(per_lane), np.asarray(scalar))


def test_batch_invariance():
    """Stream depends on ids only, not on batch slicing."""
    tab = fastrng.seed_words(KEY, 1)
    full = fastrng.uniforms(tab[0, 0], tab[0, 1], jnp.arange(1000), 5)
    part = fastrng.uniforms(tab[0, 0], tab[0, 1], jnp.arange(300, 700), 5)
    np.testing.assert_array_equal(np.asarray(full)[300:700], np.asarray(part))
