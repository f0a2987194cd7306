"""Compiled-path accelerator tests that only run on a real TPU.

The main suite runs Pallas kernels in interpret mode on CPU
(tests/test_pallas.py) — but interpret mode is not Mosaic compilation:
round 1's MAX_PALLAS_CHUNKS fault was only visible compiled on the chip.
These tests are skipped on CPU and exercise the real compiled kernels when the
suite runs in the chip environment (see .claude/skills/verify/SKILL.md):

    CRT_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Pallas/Mosaic paths need a TPU chip",
)


@pytest.fixture(scope="module")
def sphere_scene():
    from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod

    rng = np.random.default_rng(7)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        b.sphere(c, rng.uniform(0.05, 0.3), m)
    return b.build()


def _rand_rays(rng, n):
    org = jnp.asarray(rng.normal(0, 3.0, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


def test_compiled_sphere_kernel_matches_scan(sphere_scene):
    """The Mosaic-compiled sphere kernel (not interpret mode) must agree
    with the XLA chunk scan."""
    from cpu_ray_tracing_implementation_tpu.ops import chunked
    from cpu_ray_tracing_implementation_tpu.ops import pallas_intersect as pk

    rng = np.random.default_rng(1)
    org, dirs = _rand_rays(rng, 2048)
    time = jnp.zeros((2048,), jnp.float32)
    t_c, (_, _, m_c, _) = chunked.sphere_closest(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
    t_p, (_, _, m_p, _) = pk.sphere_closest_pallas(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3, interpret=False)
    hit_c = np.isfinite(np.asarray(t_c))
    hit_p = np.isfinite(np.asarray(t_p))
    np.testing.assert_array_equal(hit_c, hit_p)
    np.testing.assert_allclose(np.asarray(t_p)[hit_p], np.asarray(t_c)[hit_c],
                               rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(m_p)[hit_p],
                                  np.asarray(m_c)[hit_c])


def test_compiled_planar_kernel_large_grid():
    """Fused planar kernel at 2016 chunks (258k tris) — the sponza-class
    grid size round 1 capped at 512 chunks. Compiled, parity vs the scan."""
    from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
    from cpu_ray_tracing_implementation_tpu.ops import chunked
    from cpu_ray_tracing_implementation_tpu.ops import pallas_intersect as pk

    rng = np.random.default_rng(3)
    n = 2016 * chunked.CHUNK
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    centers = rng.normal(0, 20, (n, 3))
    b.triangles(centers[:, None, :] + rng.normal(0, 0.2, (n, 3, 3)), m)
    sc = b.build()
    assert sc.tri_chunks.corner.shape[0] >= 2016
    assert pk.fits_pallas(sc.tri_chunks)
    org, dirs = _rand_rays(rng, 1024)
    t_p, _ = pk.planar_closest_pallas(org, dirs, sc.tri_chunks, 1e-3,
                                      triangle=True)
    t_c, _ = chunked.planar_closest(org, dirs, sc.tri_chunks, 1e-3,
                                    triangle=True)
    hit = np.isfinite(np.asarray(t_c))
    np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_p)))
    np.testing.assert_allclose(np.asarray(t_p)[hit], np.asarray(t_c)[hit],
                               rtol=2e-3)


def test_compiled_packet_matches_scan(sphere_scene):
    """The packet traversal compiled for TPU must agree with the scan."""
    from cpu_ray_tracing_implementation_tpu.ops import chunked
    from cpu_ray_tracing_implementation_tpu.ops import packet as pkt

    rng = np.random.default_rng(2)
    org, dirs = _rand_rays(rng, 2048)
    time = jnp.zeros((2048,), jnp.float32)
    t_c, _ = chunked.sphere_closest(org, dirs, time,
                                    sphere_scene.sphere_chunks, 1e-3)
    t_p, _ = pkt.sphere_closest_packet(org, dirs, time,
                                       sphere_scene.sphere_chunks, 1e-3)
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_c)),
                                  np.isfinite(np.asarray(t_p)))
    m = np.isfinite(np.asarray(t_c))
    # rtol: the lockstep packet's batched [G,T,C] einsums reduce in a
    # different MXU tiling order than the scan; the sphere quadratic's
    # cancellation amplifies that f32 drift to ~5e-4 relative on chip
    np.testing.assert_allclose(np.asarray(t_p)[m], np.asarray(t_c)[m],
                               rtol=2e-3)


def test_compiled_dense_view_matches_dense_oracle():
    """Cornell's 17 dense quads through the Mosaic-compiled fused kernel
    (the small-scene routing, ops/pallas_intersect.py dense views) must
    agree with the dense-XLA oracle."""
    from cpu_ray_tracing_implementation_tpu.models import catalog
    from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
    from cpu_ray_tracing_implementation_tpu.ops import pallas_intersect as pk

    scene, _ = catalog.cornell_box(width=32, spp=1, max_depth=2)
    rng = np.random.default_rng(6)
    org = jnp.asarray(rng.uniform(100, 450, (2048, 3)), jnp.float32)
    d = rng.normal(0, 1, (2048, 3))
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                       jnp.float32)

    view = pk.dense_quad_view(scene.quads)
    t_p, (n_p, _, _, m_p, _) = pk.planar_closest_pallas(
        org, dirs, view, 1e-3, triangle=False, interpret=False)
    ts = isect.quad_ts(org, dirs, scene.quads, 1e-3, jnp.inf)
    t_d = jnp.min(ts, axis=-1)
    hit = np.isfinite(np.asarray(t_d))
    np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_p)))
    # sanity floor only (measured 1797/2048: the ray box straddles the
    # recentered scene, so ~12% of rays exit between quads) — the real
    # assertion is the mask/value agreement above/below
    assert hit.sum() > 1500
    np.testing.assert_allclose(np.asarray(t_p)[hit], np.asarray(t_d)[hit],
                               rtol=2e-3)


def test_compiled_perray_select_matches_oracle(sphere_scene):
    """The compiled cull+select kernel driving the per-ray accel (the
    default for >=256-chunk tables; forced here) must agree with the
    chunk-scan oracle on the chip."""
    from cpu_ray_tracing_implementation_tpu.ops import chunked
    from cpu_ray_tracing_implementation_tpu.ops import perray

    rng = np.random.default_rng(4)
    org, dirs = _rand_rays(rng, 1024)
    time = jnp.zeros((1024,), jnp.float32)
    t_c, _ = chunked.sphere_closest(org, dirs, time,
                                    sphere_scene.sphere_chunks, 1e-3)
    assert perray._use_pallas_select(1e-3)
    t_r, _ = perray.sphere_closest_perray(org, dirs, time,
                                          sphere_scene.sphere_chunks, 1e-3)
    np.testing.assert_array_equal(np.isfinite(np.asarray(t_c)),
                                  np.isfinite(np.asarray(t_r)))
    m = np.isfinite(np.asarray(t_c))
    np.testing.assert_allclose(np.asarray(t_r)[m], np.asarray(t_c)[m],
                               rtol=2e-3)


def test_compiled_packed_select_bitwise_end_to_end(sphere_scene):
    """Mosaic-compiled packed-key cull+select (round 4, the default) ==
    exact-mode phases through the full per-ray accel, bit-identical."""
    import functools as ft

    from cpu_ray_tracing_implementation_tpu.ops import pallas_select as ps
    from cpu_ray_tracing_implementation_tpu.ops import perray

    rng = np.random.default_rng(12)
    org, dirs = _rand_rays(rng, 1024)
    time = jnp.zeros((1024,), jnp.float32)
    orig = ps.cull_select
    try:
        ps.cull_select = ft.partial(orig, packed=False)
        t_e, (_, _, m_e, p_e) = perray.sphere_closest_perray(
            org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
        ps.cull_select = ft.partial(orig, packed=True)
        t_p, (_, _, m_p, p_p) = perray.sphere_closest_perray(
            org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
    finally:
        ps.cull_select = orig
    hit = np.isfinite(np.asarray(t_e))
    np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_p)))
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.asarray(t_p)[hit], np.asarray(t_e)[hit])
    np.testing.assert_array_equal(np.asarray(p_p)[hit], np.asarray(p_e)[hit])


def test_compiled_dma_sweep_matches_xla_sweep(sphere_scene):
    """Mosaic-compiled DMA-gather sweep kernel (ops/pallas_sweep.py —
    opt-in after the measured negative result, but it must stay CORRECT
    compiled): full per-ray accel with CRT_PALLAS_SWEEP=1 vs the default
    XLA sweep."""
    import os

    from cpu_ray_tracing_implementation_tpu.ops import perray

    rng = np.random.default_rng(13)
    org, dirs = _rand_rays(rng, 1024)
    time = jnp.zeros((1024,), jnp.float32)
    t_x, (_, _, _, p_x) = perray.sphere_closest_perray(
        org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
    os.environ["CRT_PALLAS_SWEEP"] = "1"
    try:
        t_k, (_, _, _, p_k) = perray.sphere_closest_perray(
            org, dirs, time, sphere_scene.sphere_chunks, 1e-3)
    finally:
        os.environ.pop("CRT_PALLAS_SWEEP", None)
    hit = np.isfinite(np.asarray(t_x))
    np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_k)))
    assert hit.sum() > 50
    np.testing.assert_allclose(np.asarray(t_k)[hit], np.asarray(t_x)[hit],
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(p_k)[hit], np.asarray(p_x)[hit])
