"""AOV buffers (models/aov.py) + edge-avoiding denoiser (utils/denoise.py).

Beyond-parity extensions: the reference outputs only the beauty image
(src/camera.h:146-171); here a first-hit feature pass feeds an à-trous
wavelet denoiser, validated by an actual MSE win against a high-spp
reference render.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import aov, catalog, integrator
from cpu_ray_tracing_implementation_tpu.utils import denoise


def _cornell(width, spp, depth=4):
    return catalog.cornell_box(width=width, spp=spp, max_depth=depth)


def test_aov_buffers_well_formed():
    scene, cam = _cornell(24, 2)
    bufs = aov.render_aovs(scene, cam, jax.random.key(0), spp=2)
    assert set(bufs) == {"normal", "albedo", "depth", "coverage"}
    n = np.asarray(bufs["normal"])
    c = np.asarray(bufs["coverage"])
    d = np.asarray(bufs["depth"])
    a = np.asarray(bufs["albedo"])
    assert n.shape == (24, 24, 3) and d.shape == (24, 24, 1)
    for b in (n, c, d, a):
        assert np.isfinite(b).all()
    # interior rays all hit (the box has no front wall, so border rays can
    # slip past the walls — only the image rim may be uncovered)
    np.testing.assert_array_equal(c[4:-4, 4:-4], 1.0)
    covered = c[..., 0] == 1.0
    np.testing.assert_allclose(
        np.linalg.norm(n[covered], axis=-1), 1.0, atol=1e-5)
    assert (d[covered] > 0).all()
    # albedo picks up the wall colors: green wall pixels exist
    assert ((a[..., 1] > 2 * a[..., 0]) & (a[..., 1] > 0.2)).any()


def test_aov_open_scene_coverage():
    """Rays that escape to the background leave coverage < 1 and zeroed
    features."""
    scene, cam = catalog.three_material_ball(width=16, spp=2, max_depth=2)
    bufs = aov.render_aovs(scene, cam, jax.random.key(1), spp=2)
    c = np.asarray(bufs["coverage"])
    n = np.asarray(bufs["normal"])
    assert (c < 0.5).any() and (c > 0.5).any()
    sky = c[..., 0] == 0.0
    assert np.abs(n[sky]).max() == 0.0


def _tm(x):
    """Reinhard tone map: the metric space for HDR comparisons. Raw-HDR
    MSE on this scene is >95% sub-pixel aliasing of the emitter's edge
    (radiance 15 vs partial coverage) — not noise a denoiser can or
    should remove."""
    a = np.asarray(x)
    return a / (1.0 + a)


def test_denoise_reduces_mse():
    """The denoised 4-spp render must be much closer (tone-mapped MSE) to
    a 512-spp reference than the noisy input is."""
    scene, cam = _cornell(32, 4)
    key = jax.random.key(0)
    noisy = integrator.render_image(scene, cam, key, spp=4)
    clean = integrator.render_image(scene, cam, jax.random.key(9), spp=512)
    bufs = aov.render_aovs(scene, cam, key, spp=4)
    out = np.asarray(denoise.denoise(noisy, bufs))
    assert np.isfinite(out).all()
    mse_in = float(np.mean((_tm(noisy) - _tm(clean)) ** 2))
    mse_out = float(np.mean((_tm(out) - _tm(clean)) ** 2))
    assert mse_out < 0.6 * mse_in, (mse_in, mse_out)


def test_despike_kills_isolated_firefly():
    """A lone 100x-bright pixel on a flat lit plane must be suppressed,
    while the rest of the image is untouched (despiking happens in
    demodulated space, so textured regions are safe)."""
    img = np.full((16, 16, 3), 0.5, np.float32)
    img[8, 8] = 40.0
    bufs = {
        "normal": np.broadcast_to(np.array([0, 0, 1.0], np.float32),
                                  (16, 16, 3)).copy(),
        "albedo": np.full((16, 16, 3), 0.5, np.float32),
        "depth": np.ones((16, 16, 1), np.float32),
        "coverage": np.ones((16, 16, 1), np.float32),
    }
    out = np.asarray(denoise.denoise(img, bufs, iterations=1))
    assert out[8, 8].max() < 2.0, out[8, 8]
    np.testing.assert_allclose(out[:4, :4], 0.5, rtol=1e-3)


def test_denoise_nearly_idempotent_on_converged_input():
    """A high-spp render passes through the filter nearly unchanged: the
    variance-adaptive color gate tightens where the estimator has
    converged, so the passthrough error is far below the noise floor."""
    scene, cam = _cornell(32, 4)
    noisy = integrator.render_image(scene, cam, jax.random.key(0), spp=4)
    clean = integrator.render_image(scene, cam, jax.random.key(9), spp=512)
    bufs = aov.render_aovs(scene, cam, jax.random.key(9), spp=8)
    out = np.asarray(denoise.denoise(clean, bufs))
    mse_noise = float(np.mean((_tm(noisy) - _tm(clean)) ** 2))
    mse_pass = float(np.mean((_tm(out) - _tm(clean)) ** 2))
    assert mse_pass < 0.15 * mse_noise, (mse_pass, mse_noise)
