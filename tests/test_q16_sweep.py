"""Chunk-local u16 quantized sweep (CRT_SWEEP_Q16=1, ops/perray.py):
the dequantized geometry is the scene perturbed by <= extent * 2^-16 per
axis, tested exactly — hits/winners must agree with the f32 oracle up to
that perturbation. Measured speed-neutral on chip (see _use_q16_sweep
docstring); kept as the documented quantization experiment."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.ops import chunked, perray


@pytest.fixture(scope="module")
def tri_scene():
    rng = np.random.default_rng(8)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        v = c + rng.normal(0, 0.3, (3, 3))
        b.triangle(v[0], v[1], v[2], m)
    return b.build()


def _rays(seed, n=800):
    rng = np.random.default_rng(seed)
    org = jnp.asarray(rng.normal(0, 3.0, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


def test_q16_matches_oracle_within_quantum(tri_scene, monkeypatch):
    org, dirs = _rays(0)
    t_o, (_, _, _, m_o, p_o) = chunked.planar_closest(
        org, dirs, tri_scene.tri_chunks, 1e-3, triangle=True)
    monkeypatch.setenv("CRT_SWEEP_Q16", "1")
    t_q, (_, _, _, m_q, p_q) = perray.planar_closest_perray(
        org, dirs, tri_scene.tri_chunks, 1e-3, True)
    hit_o = np.isfinite(np.asarray(t_o))
    hit_q = np.isfinite(np.asarray(t_q))
    # sub-quantum vertex perturbation: masks may disagree only on hits
    # within ~a quantum of an edge — in practice none on this workload
    assert (hit_o == hit_q).mean() >= 0.995
    both = hit_o & hit_q
    assert both.sum() > 100
    rel = (np.abs(np.asarray(t_q)[both] - np.asarray(t_o)[both])
           / np.asarray(t_o)[both])
    assert rel.max() < 0.05  # grazing hits amplify the 2^-16 perturbation
    assert np.median(rel) < 2e-3
    agree = (np.asarray(p_q)[both] == np.asarray(p_o)[both])
    assert agree.mean() >= 0.99
    np.testing.assert_array_equal(np.asarray(m_q)[both][agree],
                                  np.asarray(m_o)[both][agree])


def test_q16_off_is_bitwise_exact_path(tri_scene, monkeypatch):
    """Default (flag off) must route the exact sweep: bitwise equal to an
    explicit exact run."""
    org, dirs = _rays(1, 300)
    monkeypatch.delenv("CRT_SWEEP_Q16", raising=False)
    t_a, (_, _, _, _, p_a) = perray.planar_closest_perray(
        org, dirs, tri_scene.tri_chunks, 1e-3, True)
    t_b, (_, _, _, _, p_b) = perray.planar_closest_perray(
        org, dirs, tri_scene.tri_chunks, 1e-3, True)
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
    np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_b))


def test_q16_table_roundtrip(tri_scene):
    """Dequantized points sit within half a quantum of the originals, and
    inactive lanes keep exactly-zero edges (the intrinsic kill)."""
    chunks = tri_scene.tri_chunks
    row, lo, scale = perray._planar_table_q16(chunks)
    K, C = chunks.corner.shape[:2]
    import jax

    p = [perray._q16_unpack_pair(
        jax.lax.dynamic_slice_in_dim(row, i * C, C, axis=1))
        for i in range(5)]
    q0 = np.stack([np.asarray(p[0][0]), np.asarray(p[0][1]),
                   np.asarray(p[1][0])], axis=-1)
    q1 = np.stack([np.asarray(p[1][1]), np.asarray(p[2][0]),
                   np.asarray(p[2][1])], axis=-1)
    v0 = np.asarray(lo)[:, None, :] + q0 * np.asarray(scale)[:, None, :]
    act = np.asarray(chunks.active) > 0
    err = np.abs(v0 - np.asarray(chunks.corner))
    quantum = np.broadcast_to(np.asarray(scale)[:, None, :], err.shape)
    assert (err[act] <= 0.51 * quantum[act]).all()
    # inactive: all three points quantize identically -> integer diff 0
    eu_q = q1 - q0
    assert (eu_q[~act] == 0).all()
