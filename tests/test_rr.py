"""Russian-roulette path termination (camera.rr_depth)."""

import jax
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator


def test_rr_unbiased():
    """High-spp means with and without RR agree: the 1/p rescale exactly
    compensates the terminated paths."""
    scene, cam = catalog.cornell_box(width=16, spp=4, max_depth=8)
    key = jax.random.key(0)
    plain = np.asarray(integrator.render_image(scene, cam, key, spp=256))
    rr = np.asarray(integrator.render_image(
        scene, cam.replace(rr_depth=3), key, spp=256))
    # same key but RR re-weights individual paths; compare means
    rel = abs(rr.mean() - plain.mean()) / plain.mean()
    assert rel < 0.03, (rr.mean(), plain.mean())


def test_rr_wavefront_matches_classic():
    """The wavefront reconstructs the classic RR stream per lane, so the
    images agree (summation order only) under both RNG impls."""
    scene, cam = catalog.cornell_box(width=16, spp=8, max_depth=6)
    cam = cam.replace(rr_depth=2)
    key = jax.random.key(3)
    classic = np.asarray(integrator.render_image(scene, cam, key))
    wave = np.asarray(integrator.render_image_wavefront(scene, cam, key))
    np.testing.assert_allclose(wave, classic, rtol=2e-4, atol=2e-5)


def test_rr_off_is_bitwise_baseline():
    """rr_depth=0 must not touch the graph: bitwise equal to the render
    before the feature existed (golden pins also cover this)."""
    scene, cam = catalog.cornell_box(width=12, spp=2, max_depth=4)
    key = jax.random.key(1)
    a = np.asarray(integrator.render_image(scene, cam, key))
    b = np.asarray(integrator.render_image(scene, cam.replace(rr_depth=0),
                                           key))
    np.testing.assert_array_equal(a, b)


def test_rr_composes_with_qmc_and_clamp():
    scene, cam = catalog.cornell_box(width=12, spp=4, max_depth=5)
    cam = cam.replace(rr_depth=2, qmc=True, clamp=10.0)
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(2)))
    assert np.isfinite(img).all()
    assert img.max() <= 10.0 + 1e-5
    wave = np.asarray(integrator.render_image_wavefront(
        scene, cam, jax.random.key(2)))
    np.testing.assert_allclose(wave, img, rtol=2e-4, atol=2e-5)
