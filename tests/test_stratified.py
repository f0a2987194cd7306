"""Stratified pixel sampling (camera.stratify).

The reference README claims "stratified sampling" but ships uniform
per-pixel jitter only (src/camera.h:293; SURVEY.md appendix item 9).
camera.stratify_pixel_jitter implements the real thing — these tests pin
its geometry (exact grid, cell containment), its unbiasedness, the
variance reduction that justifies it, and stream invariance across
checkpoint chunks and the wavefront integrator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import (camera as cam_mod,
                                                       catalog, integrator)


def test_stratum_grid_exact_factorization():
    for spp in range(1, 65):
        nx, ny = cam_mod.stratum_grid(spp)
        assert nx * ny == spp
        assert 1 <= nx <= ny


def test_jitter_lands_in_its_cell():
    spp = 12
    nx, ny = cam_mod.stratum_grid(spp)
    cam = cam_mod.perspective(8, 1.0, (0, 0, 0), (0, 0, -1), spp=spp,
                              max_depth=2).replace(stratify=True)
    u = jax.random.uniform(jax.random.key(0), (64, cam_mod.N_CAM_SLOTS))
    for s in range(spp):
        out = cam_mod.stratify_pixel_jitter(cam, u, jnp.int32(s))
        sx, sy = s % nx, s // nx
        assert np.all(np.asarray(out[:, 0]) >= sx / nx)
        assert np.all(np.asarray(out[:, 0]) <= (sx + 1) / nx)
        assert np.all(np.asarray(out[:, 1]) >= sy / ny)
        assert np.all(np.asarray(out[:, 1]) <= (sy + 1) / ny)
        # other slots untouched
        np.testing.assert_array_equal(np.asarray(out[:, 2:]),
                                      np.asarray(u[:, 2:]))


def test_noop_without_flag_or_index():
    cam = cam_mod.perspective(8, 1.0, (0, 0, 0), (0, 0, -1), spp=4,
                              max_depth=2)
    u = jax.random.uniform(jax.random.key(1), (32, cam_mod.N_CAM_SLOTS))
    np.testing.assert_array_equal(
        np.asarray(cam_mod.stratify_pixel_jitter(cam, u, jnp.int32(2))),
        np.asarray(u))
    cam_s = cam.replace(stratify=True)
    np.testing.assert_array_equal(
        np.asarray(cam_mod.stratify_pixel_jitter(cam_s, u, None)),
        np.asarray(u))


def test_unbiased_cover_of_pixel_square():
    """Union of all spp strata with uniform in-cell jitter is uniform on
    [0,1)^2: the mean over samples of E[jitter] must be exactly (0.5, 0.5)."""
    spp = 18
    cam = cam_mod.perspective(8, 1.0, (0, 0, 0), (0, 0, -1), spp=spp,
                              max_depth=2).replace(stratify=True)
    u = jnp.full((4, cam_mod.N_CAM_SLOTS), 0.5)  # cell centers
    means = np.mean([np.asarray(
        cam_mod.stratify_pixel_jitter(cam, u, jnp.int32(s))[:, :2])
        for s in range(spp)], axis=(0, 1))
    np.testing.assert_allclose(means, [0.5, 0.5], atol=1e-6)


def test_variance_reduction_on_smooth_integrand():
    """spp-sample means of a smooth function of the jitter: stratified
    estimates must have materially lower variance than independent ones."""
    spp = 16
    cam = cam_mod.perspective(8, 1.0, (0, 0, 0), (0, 0, -1), spp=spp,
                              max_depth=2).replace(stratify=True)
    f = lambda xy: jnp.sin(3.0 * xy[:, 0]) * xy[:, 1] ** 2

    def estimate(key, stratified):
        total = 0.0
        for s in range(spp):
            u = jax.random.uniform(jax.random.fold_in(key, s),
                                   (1, cam_mod.N_CAM_SLOTS))
            if stratified:
                u = cam_mod.stratify_pixel_jitter(cam, u, jnp.int32(s))
            total += float(f(u[:, :2])[0])
        return total / spp

    keys = [jax.random.key(i) for i in range(48)]
    var_plain = np.var([estimate(k, False) for k in keys])
    var_strat = np.var([estimate(k, True) for k in keys])
    assert var_strat < var_plain / 3.0, (var_strat, var_plain)


@pytest.fixture(scope="module")
def small_scene():
    return catalog.cornell_box(width=24, spp=8, max_depth=3)


def test_chunk_invariance_with_stratify(small_scene):
    """Sample-chunked accumulation must still reproduce the one-shot image
    bitwise when stratification is on (strata keyed by ABSOLUTE sample)."""
    scene, cam = small_scene
    cam = cam.replace(stratify=True)
    key = jax.random.key(3)
    whole = integrator.accumulate_samples(scene, cam, key, 0, 8)
    parts = (integrator.accumulate_samples(scene, cam, key, 0, 3)
             + integrator.accumulate_samples(scene, cam, key, 3, 5))
    np.testing.assert_allclose(np.asarray(whole), np.asarray(parts),
                               rtol=1e-6, atol=1e-7)


def test_wavefront_matches_classic_stratified(small_scene):
    scene, cam = small_scene
    cam = cam.replace(stratify=True)
    key = jax.random.key(4)
    classic = integrator.render_image(scene, cam, key, spp=4)
    wave = integrator.render_image_wavefront(scene, cam, key, spp=4)
    np.testing.assert_allclose(np.asarray(classic), np.asarray(wave),
                               rtol=2e-5, atol=2e-6)


def test_stratified_image_close_to_plain(small_scene):
    """Same estimator, different jitter distribution: images agree to
    sampling noise (means within a few percent)."""
    scene, cam = small_scene
    key = jax.random.key(5)
    plain = np.asarray(integrator.render_image(scene, cam, key, spp=8))
    strat = np.asarray(integrator.render_image(
        scene, cam.replace(stratify=True), key, spp=8))
    assert np.isfinite(strat).all()
    assert abs(strat.mean() - plain.mean()) < 0.05 * max(plain.mean(), 1e-6)
