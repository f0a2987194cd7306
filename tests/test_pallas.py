"""Pallas fused-intersection kernel vs the XLA chunk-scan oracle.

Runs the kernel in interpret mode (tests are on the CPU backend); the
compiled path is exercised on hardware by the verify recipe and bench.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import chunked
from cpu_ray_tracing_implementation_tpu.ops import pallas_intersect as pk


def _tri_scene(n=700, seed=1):
    b = SceneBuilder()
    mats = [b.lambertian((1, 1, 1)), b.metal((0.5, 0.5, 0.5))]
    r = np.random.default_rng(seed)
    for i in range(n):
        p = r.uniform(-10, 10, 3)
        b.triangle(p, p + r.normal(size=3), p + r.normal(size=3), mats[i % 2])
    return b.build()


def _quad_scene(n=700, seed=2):
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    r = np.random.default_rng(seed)
    for _ in range(n):
        b.quad(r.uniform(-10, 10, 3), r.normal(size=3), r.normal(size=3), m)
    return b.build()


def _rays(rng, n=600):
    org = jnp.asarray(rng.uniform(-12, 12, (n, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    return org, dirs


@pytest.mark.parametrize("triangle", [True, False])
def test_kernel_matches_scan(triangle):
    scene = _tri_scene() if triangle else _quad_scene()
    chunks = scene.tri_chunks if triangle else scene.quad_chunks
    assert chunks is not None
    rng = np.random.default_rng(0)
    org, dirs = _rays(rng)

    t_ref, (n_ref, u_ref, v_ref, m_ref, _pid) = chunked.planar_closest(
        org, dirs, chunks, 1e-3, triangle=triangle)
    t_pk, (n_pk, u_pk, v_pk, m_pk, _pid2) = pk.planar_closest_pallas(
        org, dirs, chunks, 1e-3, triangle=triangle, interpret=True)

    valid = np.isfinite(np.asarray(t_ref))
    assert valid.sum() > 50
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_pk)), valid)
    np.testing.assert_allclose(np.asarray(t_pk)[valid], np.asarray(t_ref)[valid],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n_pk)[valid], np.asarray(n_ref)[valid],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(u_pk)[valid], np.asarray(u_ref)[valid],
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(m_pk)[valid], np.asarray(m_ref)[valid])


def test_ray_padding_lanes_never_hit():
    """R not a multiple of TILE_R: padding lanes must not leak hits."""
    scene = _tri_scene(600)
    rng = np.random.default_rng(3)
    org, dirs = _rays(rng, n=77)
    t_pk, _ = pk.planar_closest_pallas(org, dirs, scene.tri_chunks, 1e-3,
                                       triangle=True, interpret=True)
    assert t_pk.shape == (77,)
    t_ref, _ = chunked.planar_closest(org, dirs, scene.tri_chunks, 1e-3, True)
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_pk)),
                                  np.isfinite(np.asarray(t_ref)))


def test_use_pallas_gate(monkeypatch):
    monkeypatch.setenv("CRT_NO_PALLAS", "1")
    assert not pk.use_pallas()


def test_sphere_kernel_matches_scan():
    b = SceneBuilder()
    r = np.random.default_rng(7)
    m = b.lambertian((1, 1, 1))
    for _ in range(700):
        c = r.uniform(-10, 10, 3)
        b.moving_sphere(c, c + [0.3, 0, 0], r.uniform(0.1, 0.5), m)
    scene = b.build()
    assert scene.sphere_chunks is not None
    rng = np.random.default_rng(8)
    org, dirs = _rays(rng)
    time = jnp.full((org.shape[0],), 0.4)

    t_ref, (c_ref, r_ref, m_ref, _) = chunked.sphere_closest(
        org, dirs, time, scene.sphere_chunks, 1e-3)
    t_pk, (c_pk, r_pk, m_pk, _) = pk.sphere_closest_pallas(
        org, dirs, time, scene.sphere_chunks, 1e-3, interpret=True)

    valid = np.isfinite(np.asarray(t_ref))
    assert valid.sum() > 50
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_pk)), valid)
    np.testing.assert_allclose(np.asarray(t_pk)[valid], np.asarray(t_ref)[valid],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c_pk)[valid], np.asarray(c_ref)[valid],
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(m_pk)[valid], np.asarray(m_ref)[valid])
