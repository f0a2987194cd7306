"""Coherence sorting of secondary rays (ops/raysort.py).

The sort must be invisible: intersect_brute with CRT_SORT=on returns the
same per-ray hits as the unsorted path, renders match, and gradients still
flow (lax.sort permutes tangents with primals).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator
from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import raysort


def _rand_rays(rng, n, scale=3.0):
    org = jnp.asarray(rng.normal(0, scale, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


def test_sort_unsort_roundtrip():
    rng = np.random.default_rng(0)
    org, dirs = _rand_rays(rng, 1000)
    keys = raysort.coherence_keys(org, dirs, jnp.array([-5.0] * 3),
                                  jnp.array([5.0] * 3))
    (s_org, s_dirs), lane_ids = raysort.sort_rays(keys, [org, dirs])
    # sorted keys are nondecreasing
    sk = np.asarray(keys)[np.asarray(lane_ids)]
    assert (np.diff(sk) >= 0).all()
    back_org, back_dirs = raysort.unsort(lane_ids, [s_org, s_dirs])
    np.testing.assert_array_equal(np.asarray(back_org), np.asarray(org))
    np.testing.assert_array_equal(np.asarray(back_dirs), np.asarray(dirs))


def test_unsort_preserves_dtypes():
    rng = np.random.default_rng(1)
    org, dirs = _rand_rays(rng, 257)
    keys = raysort.coherence_keys(org, dirs, jnp.array([-5.0] * 3),
                                  jnp.array([5.0] * 3))
    flags = jnp.asarray(rng.random(257) > 0.5)
    ints = jnp.asarray(rng.integers(0, 99, 257), jnp.int32)
    (s_f, s_i), lane_ids = raysort.sort_rays(
        keys, [flags.astype(jnp.int32), ints])
    f2, i2 = raysort.unsort(lane_ids, [s_f.astype(bool), s_i])
    assert f2.dtype == jnp.bool_ and i2.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(flags))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ints))


@pytest.fixture(scope="module")
def chunked_scene():
    """A >DENSE_MAX sphere scene so intersect routes through chunks."""
    rng = np.random.default_rng(7)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        b.sphere(c, rng.uniform(0.05, 0.3), m)
    return b.build()


def test_sorted_intersect_matches_unsorted(chunked_scene, monkeypatch):
    assert chunked_scene.world_lo is not None
    rng = np.random.default_rng(3)
    org, dirs = _rand_rays(rng, 512)
    time = jnp.zeros((512,), jnp.float32)
    u = jnp.zeros((512, 0), jnp.float32)
    monkeypatch.setenv("CRT_SORT", "off")
    h0 = isect.intersect_brute(chunked_scene, org, dirs, time, 1e-3, u)
    monkeypatch.setenv("CRT_SORT", "on")
    h1 = isect.intersect_brute(chunked_scene, org, dirs, time, 1e-3, u)
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h0.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h0.mat), np.asarray(h1.mat))
    np.testing.assert_allclose(np.asarray(h1.normal), np.asarray(h0.normal),
                               atol=1e-6)


def test_sorted_render_matches(monkeypatch):
    """Full sphereflake render, sorted vs unsorted lanes: identical rays ->
    identical image up to fp-tie noise.

    Sphereflake children are *tangent* to their parents, so exact
    closest-hit ties exist; the sorted path visits chunks in a different
    order and may flip the argmin winner at a tie (different normal ->
    ~1e-3 shading delta on that pixel). The contract is therefore: almost
    every pixel matches tightly, and the rare tie flips stay small."""
    scene, cam = catalog.sphereflake(width=24, spp=2, max_depth=3)
    k = jax.random.key(0)
    monkeypatch.setenv("CRT_SORT", "off")
    a = np.asarray(integrator.render_image(scene, cam, k, spp=2))
    monkeypatch.setenv("CRT_SORT", "on")
    jax.clear_caches()  # env is read at trace time
    b = np.asarray(integrator.render_image(scene, cam, k, spp=2))
    diff = np.abs(b - a)
    assert (diff > 2e-5).mean() < 0.01, f"{(diff > 2e-5).mean():.4f} of values differ"
    assert diff.max() < 1e-2, f"max diff {diff.max():.5f}"
    jax.clear_caches()


def test_sorted_gradients_flow(chunked_scene, monkeypatch):
    """Gradients pass through the sorted intersect (lax.sort is
    differentiable; packet backward runs the chunk scan on sorted lanes)."""
    monkeypatch.setenv("CRT_SORT", "on")
    jax.clear_caches()
    rng = np.random.default_rng(5)
    org, dirs = _rand_rays(rng, 256)
    time = jnp.zeros((256,), jnp.float32)
    u = jnp.zeros((256, 0), jnp.float32)

    def f(o):
        h = isect.intersect_brute(chunked_scene, o, dirs, time, 1e-3, u)
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))

    g = jax.grad(f)(org)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0
    jax.clear_caches()
