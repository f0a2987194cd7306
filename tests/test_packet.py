"""Tile-packet culled closest-hit (ops/packet.py) vs the chunk-scan oracle.

The packet path visits only front-to-back-sorted hit chunks per ray tile;
it must return the same hits as scanning every chunk (ops/chunked.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.ops import chunked
from cpu_ray_tracing_implementation_tpu.ops import packet as pkt


def _rand_rays(rng, n, spread=3.0):
    org = jnp.asarray(rng.normal(0, spread, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def sphere_scene():
    rng = np.random.default_rng(7)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        b.sphere(c, rng.uniform(0.05, 0.3), m)
    return b.build()


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(8)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        v = c + rng.normal(0, 0.3, (3, 3))
        b.triangle(v[0], v[1], v[2], m)
    return b.build()


@pytest.mark.parametrize("tile", [64, 509])  # non-divisor tile exercises padding
def test_sphere_packet_matches_chunked(sphere_scene, tile):
    rng = np.random.default_rng(1)
    org, dirs = _rand_rays(rng, 777)
    time = jnp.zeros((777,), jnp.float32)
    t_c, (ctr_c, rad_c, m_c, p_c) = chunked.sphere_closest(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
    t_p, (ctr_p, rad_p, m_p, p_p) = pkt.sphere_closest_packet(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3, tile=tile)
    hit_c = np.isfinite(np.asarray(t_c))
    hit_p = np.isfinite(np.asarray(t_p))
    np.testing.assert_array_equal(hit_c, hit_p)
    assert hit_c.sum() > 50
    np.testing.assert_allclose(np.asarray(t_p)[hit_p], np.asarray(t_c)[hit_c],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_p)[hit_p],
                                  np.asarray(m_c)[hit_c])
    np.testing.assert_allclose(np.asarray(ctr_p)[hit_p],
                               np.asarray(ctr_c)[hit_c], atol=1e-5)


def test_tri_packet_matches_chunked(tri_scene):
    rng = np.random.default_rng(2)
    org, dirs = _rand_rays(rng, 512)
    t_c, (n_c, u_c, v_c, m_c, _p) = chunked.planar_closest(
        org, dirs, tri_scene.tri_chunks, 1e-3, triangle=True)
    t_p, (n_p, u_p, v_p, m_p, _pp) = pkt.planar_closest_packet(
        org, dirs, tri_scene.tri_chunks, 1e-3, True, tile=128)
    hit_c = np.isfinite(np.asarray(t_c))
    hit_p = np.isfinite(np.asarray(t_p))
    np.testing.assert_array_equal(hit_c, hit_p)
    assert hit_c.sum() > 30
    np.testing.assert_allclose(np.asarray(t_p)[hit_p], np.asarray(t_c)[hit_c],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n_p)[hit_p], np.asarray(n_c)[hit_c],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_p)[hit_p], np.asarray(u_c)[hit_c],
                               atol=1e-5)


def test_packet_respects_tmax(sphere_scene):
    rng = np.random.default_rng(3)
    org, dirs = _rand_rays(rng, 256)
    time = jnp.zeros((256,), jnp.float32)
    t_full, _ = pkt.sphere_closest_packet(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
    tmax = 2.0
    t_cut, _ = pkt.sphere_closest_packet(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3, tmax=tmax)
    tc, tf = np.asarray(t_cut), np.asarray(t_full)
    assert (tc[np.isfinite(tc)] <= tmax).all()
    keep = np.isfinite(tf) & (tf <= tmax)
    np.testing.assert_allclose(tc[keep], tf[keep], rtol=1e-6)
    assert not np.isfinite(tc[~keep]).any()


def test_packet_all_miss(sphere_scene):
    n = 70
    org = jnp.full((n, 3), 100.0, jnp.float32)
    dirs = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    time = jnp.zeros((n,), jnp.float32)
    t, _ = pkt.sphere_closest_packet(org, dirs, time,
                                     sphere_scene.sphere_chunks, 1e-3)
    assert not np.isfinite(np.asarray(t)).any()


def test_packet_vjp_matches_chunked(tri_scene):
    rng = np.random.default_rng(4)
    org, dirs = _rand_rays(rng, 128)
    chs = tri_scene.tri_chunks

    def f_accel(o):
        t, _ = pkt.planar_closest_accel(o, dirs, chs, 1e-3, True)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    def f_chunk(o):
        t, _ = chunked.planar_closest(o, dirs, chs, 1e-3, triangle=True)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g_a = np.asarray(jax.grad(f_accel)(org))
    g_c = np.asarray(jax.grad(f_chunk)(org))
    np.testing.assert_allclose(g_a, g_c, rtol=1e-5, atol=1e-6)


def test_end_to_end_packet_vs_chunked(sphere_scene, monkeypatch):
    from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod
    from cpu_ray_tracing_implementation_tpu.models import integrator

    cam = cam_mod.perspective(width=24, aspect_ratio=1.0, fovy_deg=60.0,
                              pos=(0, 0, 12), lookat=(0, 0, 0),
                              spp=2, max_depth=3)
    key = jax.random.key(0)
    monkeypatch.setenv("CRT_ACCEL", "chunked")
    img_c = np.asarray(integrator.render_image(sphere_scene, cam, key, spp=2))
    monkeypatch.setenv("CRT_ACCEL", "packet")
    img_p = np.asarray(integrator.render_image(sphere_scene, cam, key, spp=2))
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_c, atol=1e-4)


@pytest.mark.parametrize("kind", ["sphere", "tri"])
def test_lockstep_schedule_matches_map(sphere_scene, tri_scene, kind,
                                       monkeypatch):
    """CRT_PACKET=lockstep (one batched while_loop over all tiles) must
    return exactly the same hits as the default per-tile map schedule."""
    rng = np.random.default_rng(11)
    org, dirs = _rand_rays(rng, 1000)
    if kind == "sphere":
        time = jnp.zeros((1000,), jnp.float32)
        args = (org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
        run = lambda: pkt.sphere_closest_packet(*args, tile=128)
    else:
        args = (org, dirs, tri_scene.tri_chunks, 1e-3, True)
        run = lambda: pkt.planar_closest_packet(*args, tile=128)
    t_map, pay_map = run()
    monkeypatch.setenv("CRT_PACKET", "lockstep")
    t_ls, pay_ls = run()
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_map)),
                                  np.isfinite(np.asarray(t_ls)))
    m = np.isfinite(np.asarray(t_map))
    np.testing.assert_allclose(np.asarray(t_ls)[m], np.asarray(t_map)[m],
                               rtol=1e-6)
    for a_m, a_l in zip(pay_map, pay_ls):
        np.testing.assert_allclose(np.asarray(a_l)[m], np.asarray(a_m)[m],
                                   atol=1e-5)
