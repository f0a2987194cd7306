"""Analytic unit tests for batched intersection (reference semantics:
src/sphere.h, src/quad.h, src/triangle.h, src/volumne.h)."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect


def _ray(org, d):
    return (jnp.array([org], jnp.float32), jnp.array([d], jnp.float32),
            jnp.zeros((1,), jnp.float32))


def _hit(scene, org, d, t=0.0, u_vol=None):
    o, dd, tm = _ray(org, d)
    tm = tm + t
    if u_vol is None:
        u_vol = jnp.full((1, scene.n_volumes), 0.5)
    return isect.intersect_brute(scene, o, dd, tm, 1e-3, u_vol)


def test_sphere_hit_front():
    b = SceneBuilder()
    b.sphere((0, 0, -5), 1.0, b.lambertian((1, 1, 1)))
    s = b.build()
    h = _hit(s, (0, 0, 0), (0, 0, -1))
    assert bool(h.valid[0])
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
    assert bool(h.front[0])


def test_sphere_inside_back_face():
    b = SceneBuilder()
    b.sphere((0, 0, 0), 2.0, b.lambertian((1, 1, 1)))
    s = b.build()
    h = _hit(s, (0, 0, 0), (0, 0, -1))
    assert bool(h.valid[0]) and not bool(h.front[0])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    # face-forward normal points back toward the ray origin
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)


def test_sphere_miss():
    b = SceneBuilder()
    b.sphere((0, 0, -5), 1.0, b.lambertian((1, 1, 1)))
    s = b.build()
    h = _hit(s, (0, 3, 0), (0, 0, -1))
    assert not bool(h.valid[0])


def test_moving_sphere_lerp_and_normal():
    """Center lerps with ray time (src/sphere.h:83); the normal must use the
    lerped center (reference bug fixed, SURVEY.md appendix item 2)."""
    b = SceneBuilder()
    b.moving_sphere((0, 0, -5), (2, 0, -5), 1.0, b.lambertian((1, 1, 1)))
    s = b.build()
    h0 = _hit(s, (0, 0, 0), (0, 0, -1), t=0.0)
    np.testing.assert_allclose(h0.t[0], 4.0, rtol=1e-5)
    h1 = _hit(s, (2, 0, 0), (0, 0, -1), t=1.0)
    np.testing.assert_allclose(h1.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(h1.normal[0], [0, 0, 1], atol=1e-4)
    hmiss = _hit(s, (0, 0, 0), (0, 0, -1), t=1.0)
    assert not bool(hmiss.valid[0])


def test_sphere_uv_poles_and_equator():
    u, v = isect.sphere_uv(jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(v[0], 0.5, atol=1e-6)  # equator
    u, v = isect.sphere_uv(jnp.array([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(v[0], 1.0, atol=1e-6)  # +y pole (theta=pi)


def test_quad_hit_uv_interior():
    b = SceneBuilder()
    b.quad((0, 0, -2), (4, 0, 0), (0, 2, 0), b.lambertian((1, 1, 1)))
    s = b.build()
    h = _hit(s, (1, 1, 0), (0, 0, -1))
    assert bool(h.valid[0])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose([h.u[0], h.v[0]], [0.25, 0.5], atol=1e-5)
    h2 = _hit(s, (5, 1, 0), (0, 0, -1))  # outside the u edge
    assert not bool(h2.valid[0])


def test_quad_parallel_ray_misses():
    b = SceneBuilder()
    b.quad((0, 0, -2), (4, 0, 0), (0, 2, 0), b.lambertian((1, 1, 1)))
    s = b.build()
    h = _hit(s, (0, 0, 0), (1, 0, 0))
    assert not bool(h.valid[0])


def test_triangle_hit_and_edges():
    b = SceneBuilder()
    b.triangle((0, 0, -3), (2, 0, -3), (0, 2, -3), b.lambertian((1, 1, 1)))
    s = b.build()
    h = _hit(s, (0.5, 0.5, 0), (0, 0, -1))
    assert bool(h.valid[0])
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-5)
    h2 = _hit(s, (1.5, 1.5, 0), (0, 0, -1))  # beyond the hypotenuse
    assert not bool(h2.valid[0])


def test_closest_hit_wins_across_types():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.sphere((0, 0, -10), 1.0, m)
    b.quad((-1, -1, -5), (2, 0, 0), (0, 2, 0), m)
    b.triangle((-1, -1, -3), (2, -1, -3), (0, 2, -3), m)
    s = b.build()
    h = _hit(s, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-5)  # the triangle


def test_volume_scatters_inside():
    """-ln(U)/rho inside the boundary (src/volumne.h:36): with density 1e4
    any sensible U scatters immediately after entry."""
    b = SceneBuilder()
    b.volume_box((-1, -1, -5), (1, 1, -3), 1e4, (1, 1, 1))
    s = b.build()
    h = _hit(s, (0, 0, 0), (0, 0, -1), u_vol=jnp.full((1, 1), 0.5))
    assert bool(h.valid[0])
    np.testing.assert_allclose(h.t[0], 3.0, atol=1e-3)


def test_volume_u_near_one_passes_through():
    """U -> 1 gives -ln(U) -> 0 ... U -> 0 gives infinite distance, no hit."""
    b = SceneBuilder()
    b.volume_box((-1, -1, -5), (1, 1, -3), 0.0001, (1, 1, 1))
    s = b.build()
    h = _hit(s, (0, 0, 0), (0, 0, -1), u_vol=jnp.full((1, 1), 0.5))
    assert not bool(h.valid[0])


def test_volume_rotated_boundary():
    """45-degree rotated box still bounds the medium correctly."""
    b = SceneBuilder()
    b.volume_box((-1, -1, -1), (1, 1, 1), 1e4, (1, 1, 1),
                 rotate=("y", 45.0), translate=(0, 0, -5))
    s = b.build()
    h = _hit(s, (0, 0, 0), (0, 0, -1), u_vol=jnp.full((1, 1), 0.5))
    assert bool(h.valid[0])
    # rotated cube entry along the diagonal: z = -5 + sqrt(2)
    np.testing.assert_allclose(h.t[0], 5.0 - np.sqrt(2.0), atol=1e-3)


def test_padding_rows_inactive():
    """Empty tables (padded to one inactive row) must never hit."""
    b = SceneBuilder()
    b.sphere((0, 0, -5), 1.0, b.lambertian((1, 1, 1)))
    s = b.build()
    assert not bool(_hit(s, (0, 0, 1), (0, 0, 1)).valid[0])
