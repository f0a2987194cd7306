"""Dense (small-scene) tables through the fused Pallas kernels.

ops/pallas_intersect.py's dense views reshape a <=DENSE_MAX dense table as
one lane-padded chunk so the Cornell-class scenes run the same fused
kernel as large chunked scenes (VERDICT r1 item 5: the headline benchmark
path must exercise the builder's kernels). CPU runs interpret mode; the
compiled kernel on the chip is covered by tests/test_pallas_tpu.py.

Routing happens at trace time, so the A/B tests below clear the jit cache
when flipping CRT_DENSE_PALLAS (a cached compilation would silently reuse
the previous routing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, diff, integrator
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import pallas_intersect as pk


@pytest.fixture()
def force_dense_pallas(monkeypatch):
    monkeypatch.setattr(pk, "use_pallas", lambda: True)
    # dense routing is opt-in since 2026-08-19 (the 1-chunk Pallas view
    # breaks XLA's intersect+shade fusion and measures ~4x slower on chip)
    monkeypatch.setenv("CRT_DENSE_PALLAS", "1")
    yield
    jax.clear_caches()  # drop pallas-routed compilations for later tests


def _ab(monkeypatch, run):
    """(pallas_result, dense_result) of ``run()`` under the two routings."""
    out_p = run()
    jax.clear_caches()
    monkeypatch.setenv("CRT_DENSE_PALLAS", "0")
    try:
        out_d = run()
    finally:
        monkeypatch.delenv("CRT_DENSE_PALLAS")
        jax.clear_caches()
    return out_p, out_d


def _cornell(width=32, spp=2, max_depth=3):
    return catalog.cornell_box(width=width, spp=spp, max_depth=max_depth)


def _rand_rays(rng, n):
    # cornell box interior is ~[0,555]^3
    org = jnp.asarray(rng.uniform(100, 450, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


def test_dense_view_roundtrip():
    scene, _ = _cornell()
    view = pk.dense_quad_view(scene.quads)
    n = int(scene.quads.active.sum())
    assert view.corner.shape[0] == 1 and view.corner.shape[1] % 128 == 0
    assert int(view.active.sum()) == n
    # AABB covers every active quad corner
    q = scene.quads
    pts = np.concatenate([np.asarray(p)[np.asarray(q.active)] for p in
                          (q.corner, q.corner + q.eu, q.corner + q.ev,
                           q.corner + q.eu + q.ev)])
    assert (np.asarray(view.lo)[0] <= pts.min(0) + 1e-5).all()
    assert (np.asarray(view.hi)[0] >= pts.max(0) - 1e-5).all()


def test_dense_pallas_hit_matches_dense_oracle(force_dense_pallas,
                                               monkeypatch):
    scene, _ = _cornell()
    rng = np.random.default_rng(7)
    org, dirs = _rand_rays(rng, 256)
    time = jnp.zeros((256,), jnp.float32)
    u_vol = jnp.zeros((256, 0), jnp.float32)

    assert isect._dense_pallas_ok(jnp.inf)
    h_p, h_d = _ab(monkeypatch, lambda: isect.intersect_brute(
        scene, org, dirs, time, 1e-3, u_vol))

    np.testing.assert_array_equal(np.asarray(h_p.valid), np.asarray(h_d.valid))
    m = np.asarray(h_d.valid)
    assert m.sum() > 200  # interior rays almost always hit the box
    np.testing.assert_allclose(np.asarray(h_p.t)[m], np.asarray(h_d.t)[m],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p.normal)[m],
                               np.asarray(h_d.normal)[m], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h_p.mat)[m],
                                  np.asarray(h_d.mat)[m])
    np.testing.assert_allclose(np.asarray(h_p.u)[m], np.asarray(h_d.u)[m],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p.v)[m], np.asarray(h_d.v)[m],
                               atol=1e-5)


def test_dense_pallas_render_matches_dense(force_dense_pallas, monkeypatch):
    """Tiny Cornell render: dense-pallas routing == dense-XLA routing
    (same RNG stream, same estimator -> near-bitwise images)."""
    scene, cam = _cornell(width=16, spp=2, max_depth=3)
    key = jax.random.key(3)
    img_p, img_d = _ab(monkeypatch, lambda: np.asarray(
        integrator.render_image(scene, cam, key, spp=2)))
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_d, atol=1e-4)


def test_dense_pallas_grads_match_dense(force_dense_pallas, monkeypatch):
    """fwd+bwd through the custom VJP (pallas fwd, 1-chunk XLA scan bwd)
    == the dense-XLA gradients on the bench's differentiable params."""
    scene, cam = _cornell(width=12, spp=2, max_depth=2)
    target = jnp.zeros((cam.height, cam.width, 3))
    key = jax.random.key(1)

    (loss_p, (gs_p, _)), (loss_d, (gs_d, _)) = _ab(
        monkeypatch,
        lambda: diff.loss_and_grads(scene, cam, key, target, spp=2))
    np.testing.assert_allclose(float(loss_p), float(loss_d), rtol=1e-4)
    for k in gs_d:
        np.testing.assert_allclose(np.asarray(gs_p[k]), np.asarray(gs_d[k]),
                                   rtol=2e-3, atol=1e-6, err_msg=k)


def test_dense_sphere_and_tri_views(force_dense_pallas, monkeypatch):
    """three_material_ball has dense spheres+quads+tris: full routing
    parity against the dense oracle."""
    scene, cam = catalog.three_material_ball(width=24, spp=1, max_depth=2)
    key = jax.random.key(5)
    img_p, img_d = _ab(monkeypatch, lambda: np.asarray(
        integrator.render_image(scene, cam, key, spp=1)))
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_d, atol=1e-4)
