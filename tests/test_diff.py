"""Differentiable-rendering tests: finite-difference validation (the
BASELINE.md "gradient validity" metric) and inverse rendering."""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, diff
from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod


def _simple_scene(albedo=(0.5, 0.5, 0.5)):
    b = SceneBuilder()
    b.sphere((0, 0, -3), 1.0, b.lambertian(albedo))
    b.set_background(b.solid((1.0, 1.0, 1.0)))
    s = b.build()
    c = cam_mod.perspective(16, 1.0, (0, 0, 0), (0, 0, -1), 1.0, 60.0, 4, 3)
    return s, c


def test_albedo_grad_matches_finite_difference():
    """d loss / d albedo: autodiff vs central differences with the SAME RNG
    key (the loss is then a deterministic smooth function of albedo)."""
    scene, cam = _simple_scene()
    key = jax.random.key(0)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss_of(c0):
        s = scene.replace(textures=scene.textures.replace(color0=c0))
        return float(diff.image_loss(s, cam, key, target, spp=4))

    g = jax.grad(lambda c0: diff.image_loss(
        scene.replace(textures=scene.textures.replace(color0=c0)),
        cam, key, target, spp=4))(scene.textures.color0)

    eps = 1e-3
    # check the red channel of the sphere's albedo texture (row 1)
    for row, ch in [(1, 0), (1, 2), (0, 1)]:
        c0 = scene.textures.color0
        up = loss_of(c0.at[row, ch].add(eps))
        dn = loss_of(c0.at[row, ch].add(-eps))
        fd = (up - dn) / (2 * eps)
        ad = float(np.asarray(g)[row, ch])
        np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=1e-5)


def test_emission_grad_matches_finite_difference():
    b = SceneBuilder()
    b.quad((-1, -1, -3), (2, 0, 0), (0, 2, 0), b.diffuse_light((3, 3, 3)))
    scene = b.build()
    cam = cam_mod.perspective(12, 1.0, (0, 0, 0), (0, 0, -1), 1.0, 60.0, 2, 2)
    key = jax.random.key(1)
    target = jnp.full((cam.height, cam.width, 3), 0.5)

    def loss_fn(c0):
        s = scene.replace(textures=scene.textures.replace(color0=c0))
        return diff.image_loss(s, cam, key, target, spp=2)

    g = jax.grad(loss_fn)(scene.textures.color0)
    eps = 1e-3
    c0 = scene.textures.color0
    fd = (float(loss_fn(c0.at[0, 0].add(eps)))
          - float(loss_fn(c0.at[0, 0].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(float(np.asarray(g)[0, 0]), fd, rtol=5e-2, atol=1e-6)


def test_camera_fov_grad_matches_finite_difference():
    """Camera-parameter gradients flow through ray generation. The scene is
    a perlin-textured wall (smooth in hit position, so the fov gradient is
    nonzero away from silhouettes)."""
    b = SceneBuilder()
    b.quad((-20, -20, -3), (40, 0, 0), (0, 40, 0), b.lambertian(b.perlin(1.0)))
    b.set_background(b.solid((1.0, 1.0, 1.0)))
    scene = b.build()
    cam = cam_mod.perspective(12, 1.0, (0, 0, 0), (0, 0, -1), 1.0, 60.0, 2, 2)
    key = jax.random.key(2)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss_fn(fovy):
        return diff.image_loss(scene, cam.replace(fovy_deg=fovy), key, target, spp=2)

    g = float(jax.grad(loss_fn)(cam.fovy_deg))
    # eps small enough that FD curvature error is under the tolerance (the
    # perlin wall makes d3L/dfov3 large; FD converges to AD as eps -> 0)
    eps = 3e-3
    fd = (float(loss_fn(cam.fovy_deg + eps)) - float(loss_fn(cam.fovy_deg - eps))) / (2 * eps)
    assert abs(g) > 1e-6  # the gradient actually exists
    np.testing.assert_allclose(g, fd, rtol=0.1, atol=1e-6)


def test_inverse_rendering_recovers_albedo():
    """Fit a wrong-albedo scene to a target render of the true albedo."""
    true_scene, cam = _simple_scene(albedo=(0.8, 0.2, 0.5))
    target = jax.device_get(
        __import__("cpu_ray_tracing_implementation_tpu.models.integrator",
                   fromlist=["render_image"]).render_image(
            true_scene, cam, jax.random.key(9), spp=32))
    wrong_scene, _ = _simple_scene(albedo=(0.5, 0.5, 0.5))

    fitted, losses = diff.fit_scene(wrong_scene, cam, jnp.asarray(target),
                                    steps=60, lr=2.0, spp=4, seed=3,
                                    param_filter={"tex_color0"})
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    # texture row 0 is the sphere's albedo (row 1 is the background solid)
    got = np.asarray(fitted.textures.color0)[0]
    np.testing.assert_allclose(got, [0.8, 0.2, 0.5], atol=0.1)


def test_grads_finite_through_all_materials():
    """loss_and_grads returns finite grads on a scene exercising every
    material family."""
    scene, cam = catalog.cornell_box_with_volume(width=8, spp=2, max_depth=3)
    loss, (gs, gc) = diff.loss_and_grads(
        scene, cam, jax.random.key(0),
        jnp.zeros((cam.height, cam.width, 3)), spp=2)
    assert np.isfinite(float(loss))
    for name, g in {**gs, **gc}.items():
        assert np.isfinite(np.asarray(g)).all(), name


def test_fit_scene_grad_mask_freezes_rows():
    """grad_mask zeroes updates for masked rows: the background row must
    stay exactly at its start value while the sphere row moves."""
    true_scene, cam = _simple_scene(albedo=(0.8, 0.2, 0.5))
    from cpu_ray_tracing_implementation_tpu.models import integrator
    target = integrator.render_image(true_scene, cam, jax.random.key(9),
                                     spp=8)
    wrong_scene, _ = _simple_scene(albedo=(0.5, 0.5, 0.5))

    mask = np.zeros(np.asarray(wrong_scene.textures.color0).shape,
                    np.float32)
    mask[0] = 1.0  # row 0 = sphere albedo; row 1 = background solid
    start = np.asarray(wrong_scene.textures.color0).copy()
    fitted, _ = diff.fit_scene(wrong_scene, cam, jnp.asarray(target),
                               steps=8, lr=2.0, spp=2, seed=3,
                               param_filter={"tex_color0"},
                               grad_mask={"tex_color0": jnp.asarray(mask)})
    got = np.asarray(fitted.textures.color0)
    assert np.abs(got[0] - start[0]).max() > 1e-3  # sphere row moved
    np.testing.assert_array_equal(got[1:], start[1:])  # others frozen
