"""Tiled rendering (render_image_tiled) + tone-map operators (film)."""

import jax
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, film, integrator


def test_tiled_matches_untiled():
    """Any tile size reproduces the untiled image exactly (pixel-id keyed
    RNG), including a non-divisible tail tile."""
    scene, cam = catalog.cornell_box(width=20, spp=4, max_depth=2)
    key = jax.random.key(0)
    full = np.asarray(integrator.render_image(scene, cam, key))
    for tile in (77, 128, 400, 1024):
        tiled = np.asarray(integrator.render_image_tiled(
            scene, cam, key, tile_pixels=tile))
        np.testing.assert_allclose(tiled, full, rtol=1e-6, atol=1e-7,
                                   err_msg=str(tile))


def test_tiled_qmc_matches_untiled():
    scene, cam = catalog.cornell_box(width=16, spp=4, max_depth=2)
    cam = cam.replace(qmc=True)
    key = jax.random.key(1)
    full = np.asarray(integrator.render_image(scene, cam, key))
    tiled = np.asarray(integrator.render_image_tiled(scene, cam, key,
                                                     tile_pixels=100))
    np.testing.assert_allclose(tiled, full, rtol=1e-6, atol=1e-7)


def test_tonemap_modes():
    x = np.array([[[0.0, 0.5, 4.0]]], np.float32)
    none = np.asarray(film.tonemap(x, None))
    np.testing.assert_array_equal(none, x)
    rh = np.asarray(film.tonemap(x, "reinhard"))
    np.testing.assert_allclose(rh, x / (1 + x))
    aces = np.asarray(film.tonemap(x, "aces"))
    assert aces[0, 0, 0] == 0.0
    assert 0.0 < aces[0, 0, 1] < 1.0
    assert 0.9 < aces[0, 0, 2] <= 1.0  # bright input rolls off near white
    with pytest.raises(ValueError):
        film.tonemap(x, "nope")


def test_tonemap_monotone_and_bounded():
    x = np.linspace(0, 20, 200, dtype=np.float32).reshape(1, -1, 1)
    for mode in ("reinhard", "aces"):
        y = np.asarray(film.tonemap(x, mode)).ravel()
        assert (np.diff(y) >= -1e-6).all(), mode
        assert y.min() >= 0.0 and y.max() <= 1.0, mode


def test_png_tonemap_preserves_highlights(tmp_path):
    """With ACES, a radiance-2 highlight stays below 255 while a hard
    clamp saturates — the whole point of the operator."""
    img = np.full((2, 2, 3), 2.0, np.float32)
    b_none = film.to_bytes(img)
    b_aces = film.to_bytes(img, "aces")
    assert (b_none == 255).all()
    assert (b_aces < 255).all() and (b_aces > 200).all()
