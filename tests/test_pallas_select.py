"""Fused Pallas cull+select kernel (ops/pallas_select.py) vs the XLA
near-matrix + selection-rounds path it replaces. CPU runs interpret mode;
tests/test_pallas_tpu.py covers the compiled kernel on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.ops import chunked
from cpu_ray_tracing_implementation_tpu.ops import pallas_select as ps
from cpu_ray_tracing_implementation_tpu.ops import perray


def _rand_rays(rng, n, spread=3.0):
    org = jnp.asarray(rng.normal(0, spread, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(8)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        v = c + rng.normal(0, 0.3, (3, 3))
        b.triangle(v[0], v[1], v[2], m)
    return b.build()


def test_kernel_matches_xla_select(tri_scene):
    chunks = tri_scene.tri_chunks
    K = chunks.lo.shape[0]
    rng = np.random.default_rng(3)
    org, dirs = _rand_rays(rng, 200)
    cap = jnp.full((200,), 50.0)
    V = min(8, K)

    nr = perray._near_matrix(org, dirs, chunks.lo, chunks.hi, 1e-3, cap)
    ids_x, nears_x, nr_rest = perray._select_block(nr, V)
    rest_x = jnp.min(nr_rest, axis=1)

    boxes = ps.pack_boxes(chunks.lo, chunks.hi)
    rays, Rp = ps.pad_rays(ps.pack_rays(org, dirs, cap), boxes.shape[1])
    excl = jnp.concatenate([jnp.full((Rp, 1), -1e30, jnp.float32),
                            jnp.full((Rp, 1), -1.0, jnp.float32)], axis=1)
    ids_p, nears_p, rest_p = ps.cull_select(rays, boxes, excl, V, K, 1e-3,
                                            packed=False)
    ids_p, nears_p, rest_p = ids_p[:200], nears_p[:200], rest_p[:200, 0]

    fin = np.isfinite(np.asarray(nears_x))
    np.testing.assert_array_equal(fin, np.isfinite(np.asarray(nears_p)))
    np.testing.assert_allclose(np.asarray(nears_p)[fin],
                               np.asarray(nears_x)[fin], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids_p)[fin],
                                  np.asarray(ids_x)[fin])
    fin_r = np.isfinite(np.asarray(rest_x))
    np.testing.assert_array_equal(fin_r, np.isfinite(np.asarray(rest_p)))
    np.testing.assert_allclose(np.asarray(rest_p)[fin_r],
                               np.asarray(rest_x)[fin_r], rtol=1e-6)


def test_kernel_phases_partition_the_visit_order(tri_scene):
    """Phase 2 with the exclusion key must return exactly slots V..2V of
    the single-pass ordering."""
    chunks = tri_scene.tri_chunks
    K = chunks.lo.shape[0]
    if K < 4:
        pytest.skip("needs several chunks")
    rng = np.random.default_rng(4)
    org, dirs = _rand_rays(rng, 64)
    cap = jnp.full((64,), 50.0)
    V = 2

    nr = perray._near_matrix(org, dirs, chunks.lo, chunks.hi, 1e-3, cap)
    ids_a, nears_a, nr2 = perray._select_block(nr, V)
    ids_b, nears_b, _ = perray._select_block(nr2, V)

    boxes = ps.pack_boxes(chunks.lo, chunks.hi)
    rays, Rp = ps.pad_rays(ps.pack_rays(org, dirs, cap), boxes.shape[1])
    excl = jnp.concatenate([jnp.full((Rp, 1), -1e30, jnp.float32),
                            jnp.full((Rp, 1), -1.0, jnp.float32)], axis=1)
    ids_1, nears_1, _ = ps.cull_select(rays, boxes, excl, V, K, 1e-3,
                                       packed=False)
    excl2 = jnp.stack([nears_1[:, V - 1],
                       ids_1[:, V - 1].astype(jnp.float32)], axis=1)
    ids_2, nears_2, _ = ps.cull_select(rays, boxes, excl2, V, K, 1e-3,
                                       packed=False)

    fin = np.isfinite(np.asarray(nears_b))
    np.testing.assert_array_equal(
        fin, np.isfinite(np.asarray(nears_2[:64])))
    np.testing.assert_allclose(np.asarray(nears_2[:64])[fin],
                               np.asarray(nears_b)[fin], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids_2[:64])[fin],
                                  np.asarray(ids_b)[fin])


def test_perray_with_pallas_loop_matches_oracle(tri_scene, monkeypatch):
    """Full planar_closest_perray through the Pallas phase loop (interpret)
    == the chunk-scan oracle."""
    monkeypatch.setattr(perray, "_use_pallas_select", lambda tmin: True)
    monkeypatch.setenv("CRT_RAYV", "4")  # force several phases
    rng = np.random.default_rng(5)
    org, dirs = _rand_rays(rng, 300)
    t_c, (n_c, u_c, v_c, m_c, p_c) = chunked.planar_closest(
        org, dirs, tri_scene.tri_chunks, 1e-3, triangle=True)
    t_r, (n_r, u_r, v_r, m_r, p_r) = perray.planar_closest_perray(
        org, dirs, tri_scene.tri_chunks, 1e-3, True)
    hit_c = np.isfinite(np.asarray(t_c))
    hit_r = np.isfinite(np.asarray(t_r))
    np.testing.assert_array_equal(hit_c, hit_r)
    assert hit_c.sum() > 20
    np.testing.assert_allclose(np.asarray(t_r)[hit_r], np.asarray(t_c)[hit_c],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(p_r)[hit_r],
                                  np.asarray(p_c)[hit_c])


def test_packed_keys_conservative_and_same_ids(tri_scene):
    """Packed-key mode (the default): per-ray selected-id SETS equal the
    exact mode's, nears rounded DOWN by at most the stolen id bits."""
    chunks = tri_scene.tri_chunks
    K = chunks.lo.shape[0]
    rng = np.random.default_rng(9)
    org, dirs = _rand_rays(rng, 128)
    cap = jnp.full((128,), 50.0)
    V = min(8, K)

    boxes = ps.pack_boxes(chunks.lo, chunks.hi)
    rays, Rp = ps.pad_rays(ps.pack_rays(org, dirs, cap), boxes.shape[1])
    excl = jnp.concatenate([jnp.full((Rp, 1), -1e30, jnp.float32),
                            jnp.full((Rp, 1), -1.0, jnp.float32)], axis=1)
    ids_e, nears_e, _ = ps.cull_select(rays, boxes, excl, V, K, 1e-3,
                                       packed=False)
    ids_p, nears_p, _ = ps.cull_select(rays, boxes, excl, V, K, 1e-3,
                                       packed=True)
    ne = np.asarray(nears_e[:128])
    npk = np.asarray(nears_p[:128])
    fin = np.isfinite(ne)
    # NaN replaces inf for exhausted slots in packed mode; finite slots
    # must match as sets of ids with conservatively-rounded nears
    assert not np.isfinite(npk[~fin]).any()
    rel = 2.0 ** -(23 - ps._id_bits(boxes.shape[1]))
    assert (npk[fin] <= ne[fin] + 1e-12).all()
    assert (npk[fin] >= ne[fin] * (1 - 2 * rel) - 1e-12).all()
    for r in range(128):
        a = set(np.asarray(ids_e[r])[fin[r]].tolist())
        b = set(np.asarray(ids_p[r])[fin[r]].tolist())
        assert a == b, (r, a, b)


def test_packed_phase_loop_matches_exact_end_to_end(tri_scene, monkeypatch):
    """Full per-ray accel through packed-key phases == exact-mode phases
    (bit-identical winners: coarsening only reorders tie visits)."""
    import functools as ft

    monkeypatch.setattr(perray, "_use_pallas_select", lambda tmin: True)
    monkeypatch.setenv("CRT_RAYV", "4")
    rng = np.random.default_rng(10)
    org, dirs = _rand_rays(rng, 256)

    orig = ps.cull_select

    def run(packed):
        monkeypatch.setattr(
            ps, "cull_select",
            ft.partial(orig, packed=packed) if packed is not None else orig)
        return perray.planar_closest_perray(
            org, dirs, tri_scene.tri_chunks, 1e-3, True)

    t_e, (_, _, _, _, p_e) = run(False)
    t_p, (_, _, _, _, p_p) = run(True)
    hit = np.isfinite(np.asarray(t_e))
    np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_p)))
    assert hit.sum() > 20
    np.testing.assert_array_equal(np.asarray(t_p)[hit], np.asarray(t_e)[hit])
    np.testing.assert_array_equal(np.asarray(p_p)[hit], np.asarray(p_e)[hit])
