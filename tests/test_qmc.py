"""Owen-scrambled Sobol sampling (ops/qmc.py + camera.qmc).

Validates the (0,2)-sequence construction, the nested-scramble property
(scrambled points keep the net structure), and the end payoff: lower image
error than the PRNG at equal spp.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator
from cpu_ray_tracing_implementation_tpu.ops import qmc


def test_first_sobol_points_exact():
    pts = np.asarray(qmc.sobol2d(jnp.arange(8)))
    expect = np.array([
        [0.0, 0.0], [0.5, 0.5], [0.25, 0.75], [0.75, 0.25],
        [0.125, 0.625], [0.625, 0.125], [0.375, 0.375], [0.875, 0.875],
    ])
    np.testing.assert_allclose(pts, expect, atol=1e-7)


def _is_02_net(pts: np.ndarray) -> bool:
    """Every elementary interval of area 1/n contains exactly one of the
    n points, for every (a, b) split with 2^a * 2^b == n."""
    n = len(pts)
    k = int(np.log2(n))
    for a in range(k + 1):
        b = k - a
        cell = (np.floor(pts[:, 0] * (1 << a)).astype(int) * (1 << b)
                + np.floor(pts[:, 1] * (1 << b)).astype(int))
        if len(np.unique(cell)) != n:
            return False
    return True


def test_02_net_property_unscrambled():
    for k in (2, 4, 6):
        pts = np.asarray(qmc.sobol2d(jnp.arange(1 << k)))
        assert _is_02_net(pts), k


def test_02_net_property_survives_owen_scramble():
    """The Laine-Karras chain is a NESTED scramble: scrambled point sets
    must still be (0,2)-nets for every seed tested."""
    for seed0, seed1 in itertools.product((1, 0xDEADBEEF, 12345),
                                          (7, 0xC0FFEE)):
        pts = np.asarray(qmc.sobol2d(jnp.arange(64),
                                     seed0=jnp.uint32(seed0),
                                     seed1=jnp.uint32(seed1)))
        assert _is_02_net(pts), (seed0, seed1)


def test_scrambled_points_uniform():
    pts = np.asarray(qmc.sobol2d(jnp.arange(4096), seed0=jnp.uint32(99),
                                 seed1=jnp.uint32(123)))
    np.testing.assert_allclose(pts.mean(0), 0.5, atol=0.02)
    # scrambling decorrelates the two dims' joint alignment with the
    # unscrambled set but keeps each marginal equidistributed
    h0 = np.histogram(pts[:, 0], bins=16, range=(0, 1))[0]
    h1 = np.histogram(pts[:, 1], bins=16, range=(0, 1))[0]
    np.testing.assert_array_equal(h0, 256)
    np.testing.assert_array_equal(h1, 256)


def test_qmc_integration_beats_mc():
    """Integrating f(u,v) = u*v: 256 scrambled-Sobol points must beat 256
    PRNG points by a wide margin (averaged over seeds)."""
    truth = 0.25
    idx = jnp.arange(256)
    qmc_errs, mc_errs = [], []
    for seed in range(20):
        pts = np.asarray(qmc.sobol2d(idx, seed0=jnp.uint32(2 * seed + 1),
                                     seed1=jnp.uint32(7 * seed + 3)))
        qmc_errs.append(abs((pts[:, 0] * pts[:, 1]).mean() - truth))
        r = np.random.default_rng(seed).random((256, 2))
        mc_errs.append(abs((r[:, 0] * r[:, 1]).mean() - truth))
    assert np.mean(qmc_errs) < 0.25 * np.mean(mc_errs), (
        np.mean(qmc_errs), np.mean(mc_errs))


def test_uniforms_block_shape_and_range():
    words = jnp.asarray([123, 456], jnp.uint32)
    groups, dims, ng = qmc.bounce_layout(11)  # 9 slots + 2 volumes
    assert ng == 8 and len(groups) == 11
    u = np.asarray(qmc.uniforms(words, jnp.arange(100), 5, 3, groups, dims))
    assert u.shape == (100, 11)
    assert (u >= 0).all() and (u < 1).all()
    # different pixels get different scrambles
    assert not np.allclose(u[0], u[1])


def test_qmc_render_reduces_image_error():
    """camera.qmc at 16 spp must land much closer (expected MSE over
    several scrambles) to the converged image than the PRNG at 16 spp —
    the whole point of QMC."""
    scene, cam = catalog.cornell_box(width=24, spp=16, max_depth=3)
    clean = np.asarray(integrator.render_image(
        scene, cam, jax.random.key(99), spp=768))

    e_prng, e_qmc = [], []
    for k in range(4):
        kk = jax.random.key(k)
        prng = np.asarray(integrator.render_image(scene, cam, kk, spp=16))
        qmc_img = np.asarray(integrator.render_image(
            scene, cam.replace(qmc=True), kk, spp=16))
        e_prng.append(np.mean((prng - clean) ** 2))
        e_qmc.append(np.mean((qmc_img - clean) ** 2))
    assert np.mean(e_qmc) < 0.6 * np.mean(e_prng), (np.mean(e_qmc),
                                                    np.mean(e_prng))


def test_qmc_wavefront_matches_classic():
    scene, cam = catalog.cornell_box(width=16, spp=8, max_depth=3)
    cam = cam.replace(qmc=True)
    key = jax.random.key(5)
    classic = np.asarray(integrator.render_image(scene, cam, key))
    wave = np.asarray(integrator.render_image_wavefront(scene, cam, key))
    np.testing.assert_allclose(wave, classic, rtol=2e-4, atol=2e-5)


def test_qmc_sharded_matches_single_chip():
    import jax as _jax

    if len(_jax.devices()) < 2:
        import pytest

        pytest.skip("needs the multi-device CPU mesh")
    from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm

    scene, cam = catalog.cornell_box(width=16, spp=8, max_depth=3)
    cam = cam.replace(qmc=True)
    key = jax.random.key(2)
    single = np.asarray(integrator.render_image(scene, cam, key))
    sharded = np.asarray(pm.render_image_sharded(scene, cam, key,
                                                 pm.make_mesh()))
    # same samples, but XLA fuses the u32 Sobol chain differently inside
    # shard_map — allow reassociation-level float drift (<=1 ulp observed)
    np.testing.assert_allclose(single, sharded, rtol=2e-7, atol=1e-8)
