"""Live spectral rendering (hero-wavelength dispersion).

The reference's spectrum.h is scaffolding no material ever calls
(SURVEY.md §2.1); here the layer drives a real render mode: dielectrics
with a Cauchy dispersion coefficient refract per-path wavelengths
differently and radiance is weighted by the normalized wavelength->RGB
response (ops/spectrum.py), statically gated by Scene.has_dispersion.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod
from cpu_ray_tracing_implementation_tpu.models import catalog, diff, integrator
from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import spectrum as sp


def test_cauchy_shift_zero_at_sodium_line():
    assert abs(float(sp.cauchy_ior_shift(589.0))) < 1e-4
    # blue bends more: shift positive below 589, negative above
    assert float(sp.cauchy_ior_shift(420.0)) > 0.5
    assert float(sp.cauchy_ior_shift(700.0)) < -0.5


def test_spectral_weight_mean_is_white():
    """E_[lambda ~ U(380, 750)] of the path weight must be (1,1,1): a
    dispersion-free path stays white in expectation."""
    wl = jnp.linspace(sp.WAVELENGTH_MIN, sp.WAVELENGTH_MAX, 2000)
    mean = np.asarray(jnp.mean(sp.spectral_path_weight(wl), axis=0))
    np.testing.assert_allclose(mean, 1.0, atol=0.02)


def test_flag_off_for_plain_scenes():
    scene, _ = catalog.cornell_box(width=8, spp=1, max_depth=2)
    assert not scene.has_dispersion
    scene2, _ = catalog.dispersion_prism(width=8, spp=1, max_depth=2)
    assert scene2.has_dispersion


def test_wavelength_weight_factorizes_without_dielectrics():
    """On a dielectric-free scene the wavelength only scales radiance:
    render_rays(wavelength=wl) == render_rays() * weight(wl) exactly."""
    b = SceneBuilder()
    b.sphere((0, 0, -3), 1.0, b.lambertian((0.6, 0.4, 0.2)))
    b.set_background(b.solid((0.9, 0.9, 0.9)))
    scene = b.build()
    rng = np.random.default_rng(0)
    n = 64
    org = jnp.zeros((n, 3), jnp.float32)
    d = rng.normal(0, 1, (n, 3)); d[:, 2] = -np.abs(d[:, 2]) - 1.0
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                       jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    wl = jnp.asarray(rng.uniform(380, 750, (n,)), jnp.float32)

    key = jax.random.key(3)
    plain = integrator.render_rays(scene, org, dirs, time, key, 3)
    spec = integrator.render_rays(scene, org, dirs, time, key, 3,
                                  wavelength=wl)
    np.testing.assert_allclose(
        np.asarray(spec),
        np.asarray(plain * sp.spectral_path_weight(wl)), rtol=1e-5)


def test_dispersive_refraction_differs_by_wavelength():
    """Through the dispersive sphere, blue (420nm) and red (700nm) paths
    land differently; with dispersion 0 they are identical."""
    def build(disp):
        b = SceneBuilder()
        b.sphere((0, 0, -3), 1.0, b.dielectric(1.5, dispersion=disp))
        # achromatic checker: per-channel transport is identical, so the
        # per-channel weight can be divided out on any lit channel
        b.quad((-20, -20, -8), (40, 0, 0), (0, 40, 0),
               b.lambertian(b.checker((1, 1, 1), (0.1, 0.1, 0.1), 0.5)))
        b.set_background(b.solid((0.5, 0.5, 0.5)))
        return b.build()

    n = 128
    rng = np.random.default_rng(1)
    org = jnp.zeros((n, 3), jnp.float32)
    d = rng.normal(0, 0.25, (n, 3)); d[:, 2] = -1.0
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                       jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    key = jax.random.key(5)

    for disp, should_differ in ((0.08, True), (0.0, False)):
        scene = build(disp)
        blue = integrator.render_rays(
            scene, org, dirs, time, key, 4,
            wavelength=jnp.full((n,), 420.0))
        red = integrator.render_rays(
            scene, org, dirs, time, key, 4,
            wavelength=jnp.full((n,), 700.0))
        # undo the per-wavelength RGB weight on a channel it actually
        # lights (blue channel at 420 nm, red at 700 nm): the achromatic
        # scene makes the remaining scalar pure transport
        w_b = float(sp.spectral_path_weight(jnp.float32(420.0))[2])
        w_r = float(sp.spectral_path_weight(jnp.float32(700.0))[0])
        t_blue = np.asarray(blue)[:, 2] / w_b
        t_red = np.asarray(red)[:, 0] / w_r
        differ = np.abs(t_blue - t_red).max() > 1e-3
        assert differ == should_differ, (disp, np.abs(t_blue - t_red).max())


def test_prism_render_shows_spectral_separation():
    """The dispersion_prism render must contain strongly red-dominant AND
    strongly blue-dominant pixels (the rainbow); a zero-dispersion copy of
    the same scene has neither (white strips only)."""
    scene, cam = catalog.dispersion_prism(width=48, spp=16, max_depth=4)
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(0)))
    assert np.isfinite(img).all()
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    lit = img.max(-1) > 0.05
    red_dom = (r > 2.0 * (b + 1e-3)) & lit
    blue_dom = (b > 2.0 * (r + 1e-3)) & lit
    assert red_dom.sum() > 10 and blue_dom.sum() > 10

    plain = scene.replace(
        materials=scene.materials.replace(
            dispersion=jnp.zeros_like(scene.materials.dispersion)),
        has_dispersion=False)
    img0 = np.asarray(integrator.render_image(plain, cam, jax.random.key(0)))
    r0, b0 = img0[..., 0], img0[..., 2]
    lit0 = img0.max(-1) > 0.05
    assert ((r0 > 2.0 * (b0 + 1e-3)) & lit0).sum() == 0
    assert ((b0 > 2.0 * (r0 + 1e-3)) & lit0).sum() == 0


def test_wavefront_matches_classic_on_dispersive_scene(monkeypatch):
    """The path-regeneration wavefront threads each lane's hero wavelength
    through its refill logic; the image must match the classic scan (same
    per-path stream, different summation order) under both RNG impls."""
    scene, cam = catalog.dispersion_prism(width=24, spp=4, max_depth=3)
    for impl in ("fast", "threefry"):
        monkeypatch.setenv("CRT_RNG", impl)
        jax.clear_caches()  # _rng_impl is read at trace time
        classic = np.asarray(integrator.render_image(
            scene, cam, jax.random.key(7), spp=4))
        wave = np.asarray(integrator.render_image_wavefront(
            scene, cam, jax.random.key(7), spp=4))
        np.testing.assert_allclose(wave, classic, rtol=2e-4, atol=2e-5,
                                   err_msg=impl)
    jax.clear_caches()  # drop the threefry traces before later tests


def test_dispersion_grads_finite():
    scene, cam = catalog.dispersion_prism(width=8, spp=2, max_depth=3)
    loss, (gs, _) = diff.loss_and_grads(
        scene, cam, jax.random.key(0),
        jnp.zeros((cam.height, cam.width, 3)), spp=2)
    assert np.isfinite(float(loss))
    for name, g in gs.items():
        assert np.isfinite(np.asarray(g)).all(), name
