"""Camera ray-generation tests (reference semantics: src/camera.h:18-132,
244-296)."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import camera as cam
from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm


def _center_ray(c):
    """Ray through the exact image center (jitter = 0.5 -> +0.5 offset already
    in dir00; we use the center pixel with jitter 0.5)."""
    W, H = c.width, c.height
    pid = jnp.array([(H // 2) * W + W // 2], jnp.int32)
    u = jnp.full((1, cam.N_CAM_SLOTS), 0.5)
    u = u.at[0, 0].set(0.5 if W % 2 == 1 else 0.0)
    u = u.at[0, 1].set(0.5 if H % 2 == 1 else 0.0)
    return cam.generate_rays(c, pid, u)


def test_perspective_center_ray_points_at_lookat():
    c = cam.perspective(64, 1.0, (0, 0, 5), (0, 0, 0), 1.0, 90.0, 1, 1)
    org, d, t = _center_ray(c)
    np.testing.assert_allclose(org[0], [0, 0, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.normalize(d))[0], [0, 0, -1], atol=1e-5)


def test_perspective_fov_edge_angle():
    """fovy=90, focal=1: the top edge of the viewport is 45 deg off axis."""
    c = cam.perspective(64, 1.0, (0, 0, 0), (0, 0, -1), 1.0, 90.0, 1, 1)
    pid = jnp.array([64 // 2], jnp.int32)  # top row, center col
    u = jnp.full((1, cam.N_CAM_SLOTS), 0.0)
    org, d, t = cam.generate_rays(c, pid, u)
    dn = np.asarray(vm.normalize(d))[0]
    angle = np.degrees(np.arccos(-dn[2]))
    assert 40.0 < angle < 50.0


def test_orthographic_parallel_rays():
    c = cam.orthographic(32, 1.0, 4.0, (0, 0, 5), (0, 0, 0), 1, 1)
    pids = jnp.array([0, 31, 32 * 31], jnp.int32)
    u = jnp.full((3, cam.N_CAM_SLOTS), 0.5)
    org, d, t = cam.generate_rays(c, pids, u)
    d = np.asarray(vm.normalize(d))
    np.testing.assert_allclose(d, np.tile([[0, 0, -1]], (3, 1)), atol=1e-6)
    # origins differ across the viewport
    assert np.abs(np.asarray(org)[0] - np.asarray(org)[1]).max() > 0.1


def test_fisheye_preserves_center_and_is_finite_at_corners():
    c = cam.fisheye(33, 1.0, (0, 0, 5), (0, 0, 0), 1.0, 90.0, 1, 1)
    org, d, t = _center_ray(c)
    np.testing.assert_allclose(np.asarray(vm.normalize(d))[0], [0, 0, -1], atol=1e-3)
    pid = jnp.array([0], jnp.int32)  # image corner
    u = jnp.full((1, cam.N_CAM_SLOTS), 0.0)
    _, d_corner, _ = cam.generate_rays(c, pid, u)
    assert np.isfinite(np.asarray(d_corner)).all()


def test_lens_rays_converge_at_focus_plane():
    """All defocus-disk rays pass through the same focus-plane point
    (src/camera.h:276-283)."""
    c = cam.lens(33, 1.0, (0, 0, 5), (0, 0, 0), defocus_angle_deg=10.0,
                 focus_dist=5.0, fovy_deg=60.0, spp=1, max_depth=1)
    W, H = c.width, c.height
    pid = jnp.full((8,), (H // 2) * W + W // 2, jnp.int32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(size=(8, cam.N_CAM_SLOTS)).astype(np.float32))
    u = u.at[:, 0].set(0.5).at[:, 1].set(0.5)  # same pixel jitter, random disk
    org, d, t = cam.generate_rays(c, pid, u)
    hit_pts = np.asarray(org) + np.asarray(d)  # t=1 reaches the focus plane
    assert np.asarray(org).std(0).max() > 1e-3  # origins actually spread
    np.testing.assert_allclose(hit_pts.std(axis=0), 0.0, atol=1e-4)


def test_aspect_ratio_height():
    c = cam.perspective(1280, 16 / 9, (0, 0, 0), (0, 0, -1), 1, 90, 1, 1)
    assert c.height == 720
