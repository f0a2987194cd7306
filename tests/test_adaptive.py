"""Adaptive sampling (models/adaptive.py).

The (pixel id, absolute sample index) RNG contract makes adaptive renders
exactly reproducible against uniform renders: tolerance 0 == uniform
max_spp; infinite tolerance == uniform min_spp.
"""

import jax
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import adaptive, catalog, integrator


@pytest.fixture(scope="module")
def cornell():
    return catalog.cornell_box(width=24, spp=8, max_depth=3)


def test_tol_zero_equals_uniform_max_spp(cornell):
    scene, cam = cornell
    key = jax.random.key(0)
    img = adaptive.render_image_adaptive(scene, cam, key, rel_tol=0.0,
                                         min_spp=4, max_spp=16, chunk_spp=4)
    ref = np.asarray(integrator.render_image(scene, cam, key, spp=16))
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)


def test_huge_tol_equals_uniform_min_spp(cornell):
    scene, cam = cornell
    key = jax.random.key(0)
    img, spp_map = adaptive.render_image_adaptive(
        scene, cam, key, rel_tol=1e6, min_spp=4, max_spp=16, chunk_spp=4,
        zero_var_spp=4, return_spp_map=True)
    ref = np.asarray(integrator.render_image(scene, cam, key, spp=4))
    np.testing.assert_array_equal(spp_map, 4)
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)


def test_budget_concentrates_on_noisy_pixels(cornell):
    """With a realistic tolerance, the mean spp sits strictly between
    min and max, and unconverged (high-variance) pixels get more samples
    than the flat directly-lit wall."""
    scene, cam = cornell
    key = jax.random.key(0)
    img, spp_map = adaptive.render_image_adaptive(
        scene, cam, key, rel_tol=0.10, min_spp=8, max_spp=128, chunk_spp=8,
        return_spp_map=True)
    assert np.isfinite(img).all()
    assert spp_map.min() >= 8 and spp_map.max() <= 128
    mean_spp = spp_map.mean()
    assert 8 < mean_spp < 128, mean_spp
    # some pixels converge early AND some run long: real discrimination
    assert (spp_map == 8).any()
    assert (spp_map >= 64).any()


def test_adaptive_result_consistent_with_converged_render(cornell):
    """The adaptive image must agree with a very high-spp uniform render
    to within its own advertised tolerance (sanity: no broken
    accumulation or id mixups from the compaction/padding)."""
    scene, cam = cornell
    img = adaptive.render_image_adaptive(
        scene, cam, jax.random.key(0), rel_tol=0.10, min_spp=8,
        max_spp=128, chunk_spp=8)
    ref = np.asarray(integrator.render_image(scene, cam, jax.random.key(3),
                                             spp=512))
    lum = 0.2126 * ref[..., 0] + 0.7152 * ref[..., 1] + 0.0722 * ref[..., 2]
    lum_a = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
             + 0.0722 * img[..., 2])
    rel = np.abs(lum_a - lum) / (lum + 0.05)
    # 95% CI at 10% tolerance: the bulk must be within ~3x of it
    assert np.quantile(rel, 0.95) < 0.30, np.quantile(rel, 0.95)


def test_adaptive_sharded_matches_single_device():
    """Sharded adaptive == single-device adaptive BITWISE (image + spp
    map): each round's unconverged batch shards over the mesh with the
    same pixel-id keyed streams (round 5, --adaptive --sharded)."""
    import jax
    import numpy as np

    from cpu_ray_tracing_implementation_tpu.models import adaptive, catalog
    from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm

    scene, cam = catalog.cornell_box(width=12, spp=32, max_depth=3)
    key = jax.random.key(5)
    img1, m1 = adaptive.render_image_adaptive(
        scene, cam, key, rel_tol=0.2, chunk_spp=8, return_spp_map=True)
    img2, m2 = adaptive.render_image_adaptive(
        scene, cam, key, rel_tol=0.2, chunk_spp=8, return_spp_map=True,
        mesh=pm.make_mesh())
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
