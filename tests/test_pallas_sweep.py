"""Pallas DMA-gather sweep kernel (ops/pallas_sweep.py) vs the XLA
row-gather sweep it replaces, and end-to-end vs the chunk-scan oracle.
CPU runs interpret mode; tests/test_pallas_tpu.py covers the compiled
kernel on the chip."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.ops import chunked
from cpu_ray_tracing_implementation_tpu.ops import pallas_sweep as psw
from cpu_ray_tracing_implementation_tpu.ops import perray


def _rand_rays(rng, n, spread=3.0):
    org = jnp.asarray(rng.normal(0, spread, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(11)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (600, 3)):
        v = c + rng.normal(0, 0.3, (3, 3))
        b.triangle(v[0], v[1], v[2], m)
    return b.build()


@pytest.fixture(scope="module")
def sph_scene():
    rng = np.random.default_rng(12)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (600, 3)):
        b.sphere(c, abs(rng.normal(0.2, 0.05)) + 0.05, m)
    return b.build()


def _planar_inputs(scene, rng, n=256):
    chunks = scene.tri_chunks
    K, C = chunks.corner.shape[:2]
    org, dirs = _rand_rays(rng, n)
    cap = jnp.full((n,), 50.0)
    V = min(8, K)
    nr = perray._near_matrix(org, dirs, chunks.lo, chunks.hi, 1e-3, cap)
    ids, nears, _ = perray._select_block(nr, V)
    return chunks, K, C, org, dirs, cap, V, ids, nears


def test_planar_sweep_kernel_matches_xla(tri_scene):
    rng = np.random.default_rng(21)
    chunks, K, C, org, dirs, cap, V, ids, nears = _planar_inputs(
        tri_scene, rng)
    R = org.shape[0]
    table = perray._planar_table(chunks)
    best0 = (cap, jnp.zeros((R, 3)), jnp.zeros((R,)), jnp.zeros((R,)),
             jnp.zeros((R,), jnp.int32), jnp.zeros((R,), jnp.int32))

    ref = perray._planar_sweep(org, dirs, table, C,
                               jnp.clip(ids, 0, K - 1), nears, 1e-3,
                               True, best0)
    fn = perray._planar_sweep_pallas(org, dirs, table, K, C, 1e-3, True)
    got = fn(ids, nears, best0)

    for r, g, name in zip(ref, got, ["t", "n", "u", "v", "mat", "pid"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_sphere_sweep_kernel_matches_xla(sph_scene):
    rng = np.random.default_rng(22)
    chunks = sph_scene.sphere_chunks
    K, C = chunks.rad.shape
    org, dirs = _rand_rays(rng, 256)
    R = org.shape[0]
    time = jnp.zeros((R,))
    cap = jnp.full((R,), 50.0)
    V = min(8, K)
    nr = perray._near_matrix(org, dirs, chunks.lo, chunks.hi, 1e-3, cap)
    ids, nears, _ = perray._select_block(nr, V)
    table = perray._sphere_table(chunks)
    best0 = (cap, jnp.zeros((R, 3)), jnp.ones((R,)),
             jnp.zeros((R,), jnp.int32), jnp.zeros((R,), jnp.int32))

    ref = perray._sphere_sweep(org, dirs, time, table, C,
                               jnp.clip(ids, 0, K - 1), nears, 1e-3, best0)
    fn = perray._sphere_sweep_pallas(org, dirs, time, table, K, C, 1e-3)
    got = fn(ids, nears, best0)

    for r, g, name in zip(ref, got, ["t", "ctr", "rad", "mat", "pid"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_sphere_perray_pallas_loop_matches_oracle(sph_scene, monkeypatch):
    monkeypatch.setattr(perray, "_use_pallas_select", lambda tmin: True)
    monkeypatch.setenv("CRT_RAYV", "4")  # force several phases
    rng = np.random.default_rng(23)
    org, dirs = _rand_rays(rng, 300)
    time = jnp.zeros((300,))
    t_c, (c_c, r_c, m_c, p_c) = chunked.sphere_closest(
        org, dirs, time, sph_scene.sphere_chunks, 1e-3)
    t_r, (c_r, r_r, m_r, p_r) = perray.sphere_closest_perray(
        org, dirs, time, sph_scene.sphere_chunks, 1e-3)
    hit_c = np.isfinite(np.asarray(t_c))
    hit_r = np.isfinite(np.asarray(t_r))
    np.testing.assert_array_equal(hit_c, hit_r)
    assert hit_c.sum() > 20
    # rtol 5e-4: the oracle's MXU-expanded quadratic vs the kernel's
    # direct |o-c|^2 form differ at f32 ulp level; winner ids must agree
    np.testing.assert_allclose(np.asarray(t_r)[hit_r],
                               np.asarray(t_c)[hit_c], rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(p_r)[hit_r],
                                  np.asarray(p_c)[hit_c])


def test_sweep_optout_env_matches_kernel(tri_scene, monkeypatch):
    """CRT_PALLAS_SWEEP=0 (XLA sweep inside the Pallas phase loop) and the
    default kernel path agree end-to-end."""
    monkeypatch.setattr(perray, "_use_pallas_select", lambda tmin: True)
    rng = np.random.default_rng(24)
    org, dirs = _rand_rays(rng, 300)
    monkeypatch.setenv("CRT_PALLAS_SWEEP", "0")
    t_a, (_, _, _, _, p_a) = perray.planar_closest_perray(
        org, dirs, tri_scene.tri_chunks, 1e-3, True)
    monkeypatch.setenv("CRT_PALLAS_SWEEP", "1")
    t_b, (_, _, _, _, p_b) = perray.planar_closest_perray(
        org, dirs, tri_scene.tri_chunks, 1e-3, True)
    hit = np.isfinite(np.asarray(t_a))
    np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_b)))
    np.testing.assert_allclose(np.asarray(t_b)[hit], np.asarray(t_a)[hit],
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(p_b)[hit],
                                  np.asarray(p_a)[hit])
