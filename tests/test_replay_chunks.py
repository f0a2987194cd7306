"""Winner-replay backward for the accelerated intersectors (ops/replay.py
+ ops/perray.py / ops/packet.py autodiff glue).

Round 2's custom VJPs re-ran the full XLA chunk scan backward — a
colonnade gradient step paid the 2,015-chunk sweep the forward avoided.
Now the backward gathers the forward's winning primitive and
differentiates that single intersection (O(R)). min/argmin already route
gradients to the winner, so the replay grads must equal the chunk-scan
VJP's to fp tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.ops import chunked
from cpu_ray_tracing_implementation_tpu.ops import packet as pkt
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


@pytest.fixture(scope="module")
def sphere_scene():
    rng = np.random.default_rng(7)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (700, 3)):
        b.sphere(c, rng.uniform(0.05, 0.3), m)
    return b.build()


def _loss_outputs(t, payload):
    """Scalar touching every differentiable output (finite-masked)."""
    n, a, b = payload[0], payload[1], payload[2]
    ok = jnp.isfinite(t)
    return (jnp.sum(jnp.where(ok, t, 0.0))
            + jnp.sum(jnp.where(ok[:, None], n, 0.0))
            + jnp.sum(jnp.where(ok, a + b, 0.0)))


def _grad_compare(g_acc, g_ref, names, active=None, rtol=2e-3, atol=1e-4,
                  outlier_frac=0.02, outlier_rtol=0.15):
    """``active``: [K,C] mask limiting table-grad comparison to real rows —
    the chunk-scan VJP emits NaN on inactive PADDED rows (its [R,C] pass
    runs degenerate all-zero geometry through normalize/1e30 sentinels;
    latent and harmless, nothing reads padding grads), while the replay VJP
    never gathers them and correctly returns 0 there.

    ``outlier_frac``/``outlier_rtol``: the winner DECISIONS are identical
    (forward parity tests pin accel == chunk scan exactly), but the replay
    re-derives t from the direct |o-c|^2 quadratic while the scan uses the
    MXU expansion — algebraically equal, and dt/d(inputs) carries a
    1/sqrt(disc) factor that amplifies their f32 difference without bound
    at grazing incidence. A small fraction of lanes (~1% on these random
    scenes) may therefore differ by a few percent; every element must
    still agree to ``outlier_rtol``."""
    for ga, gr, nm in zip(g_acc, g_ref, names):
        fa = jax.tree_util.tree_leaves(ga)
        fr = jax.tree_util.tree_leaves(gr)
        for xa, xr in zip(fa, fr):
            xa, xr = np.asarray(xa), np.asarray(xr)
            if not np.issubdtype(xa.dtype, np.floating):
                continue
            if active is not None and xa.shape[:2] == active.shape:
                m = active
                while m.ndim < xa.ndim:
                    m = m[..., None]
                xa = np.where(m, xa, 0.0)
                xr = np.where(m, xr, 0.0)
            err = np.abs(xa - xr)
            tol = atol + rtol * np.abs(xr)
            bad = err > tol
            frac = bad.mean()
            assert frac <= outlier_frac, (
                f"{nm}: {frac:.2%} of elements beyond rtol={rtol}")
            np.testing.assert_allclose(xa, xr, rtol=outlier_rtol, atol=atol,
                                       err_msg=f"{nm} (outlier bound)")


@pytest.mark.parametrize("accel", ["perray", "packet"])
def test_planar_replay_grads_match_chunk_scan(tri_scene, accel, monkeypatch):
    monkeypatch.setenv("CRT_RAYV", "8")
    rng = np.random.default_rng(3)
    org, dirs = _rand_rays(rng, 384)
    chunks = tri_scene.tri_chunks

    if accel == "perray":
        fn = lambda o, d, c: _loss_outputs(
            *perray.planar_closest_ray(o, d, c, 1e-3, True))
    else:
        fn = lambda o, d, c: _loss_outputs(
            *pkt.planar_closest_accel(o, d, c, 1e-3, True))
    ref = lambda o, d, c: _loss_outputs(
        *chunked.planar_closest(o, d, c, 1e-3, triangle=True))

    g_acc = jax.grad(fn, argnums=(0, 1, 2), allow_int=True)(org, dirs, chunks)
    g_ref = jax.grad(ref, argnums=(0, 1, 2), allow_int=True)(org, dirs, chunks)
    _grad_compare(g_acc, g_ref, ["org", "dirs", "chunks"],
                  active=np.asarray(chunks.active))
    # non-trivial: geometry gradients actually flow into the chunk tables
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g_acc[2])
                if jnp.issubdtype(x.dtype, jnp.floating))
    assert total > 0.0


@pytest.mark.parametrize("accel", ["perray", "packet"])
def test_sphere_replay_grads_match_chunk_scan(sphere_scene, accel,
                                              monkeypatch):
    monkeypatch.setenv("CRT_RAYV", "8")
    rng = np.random.default_rng(4)
    org, dirs = _rand_rays(rng, 384)
    time = jnp.zeros((384,), jnp.float32)
    chunks = sphere_scene.sphere_chunks

    def loss_sph(t, payload):
        ctr, rad = payload[0], payload[1]
        ok = jnp.isfinite(t)
        return (jnp.sum(jnp.where(ok, t, 0.0))
                + jnp.sum(jnp.where(ok[:, None], ctr, 0.0))
                + jnp.sum(jnp.where(ok, rad, 0.0)))

    if accel == "perray":
        fn = lambda o, d, tm, c: loss_sph(
            *perray.sphere_closest_ray(o, d, tm, c, 1e-3))
    else:
        fn = lambda o, d, tm, c: loss_sph(
            *pkt.sphere_closest_accel(o, d, tm, c, 1e-3))
    ref = lambda o, d, tm, c: loss_sph(
        *chunked.sphere_closest(o, d, tm, c, 1e-3))

    g_acc = jax.grad(fn, argnums=(0, 1, 2, 3),
                     allow_int=True)(org, dirs, time, chunks)
    g_ref = jax.grad(ref, argnums=(0, 1, 2, 3),
                     allow_int=True)(org, dirs, time, chunks)
    _grad_compare(g_acc, g_ref, ["org", "dirs", "time", "chunks"],
                  active=np.asarray(chunks.active))


def test_moving_sphere_replay_time_grads(monkeypatch):
    """Motion blur: d(loss)/d(time) flows through the replayed lerped
    center."""
    monkeypatch.setenv("CRT_RAYV", "8")
    rng = np.random.default_rng(5)
    b = scene_mod.SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for c in rng.normal(0, 3.0, (600, 3)):
        b.moving_sphere(c, c + [0.4, 0, 0], rng.uniform(0.1, 0.3), m)
    scene = b.build()
    org, dirs = _rand_rays(rng, 256)
    time = jnp.full((256,), 0.3)

    def f(impl):
        def loss(tm):
            t, (ctr, rad, mat, pid) = impl(org, dirs, tm,
                                           scene.sphere_chunks, 1e-3)
            ok = jnp.isfinite(t)
            return jnp.sum(jnp.where(ok, t, 0.0))
        return jax.grad(loss)(time)

    g_acc = f(lambda *a: perray.sphere_closest_ray(*a))
    g_ref = f(lambda *a: chunked.sphere_closest(*a))
    assert float(jnp.abs(g_ref).sum()) > 0.0
    np.testing.assert_allclose(np.asarray(g_acc), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-4)


def test_colonnade_grad_uses_replay_end_to_end(monkeypatch):
    """A full loss_and_grads step on a (small) chunked mesh runs finite and
    non-zero through the replay backward — the end-to-end path VERDICT
    round 2 called practically unusable."""
    from cpu_ray_tracing_implementation_tpu.models import catalog, diff

    scene, cam = catalog.sponza(width=12, spp=1, max_depth=2,
                                substitute_tris=2000)
    assert scene.tri_chunks is not None
    target = jnp.zeros((cam.height, cam.width, 3))
    loss, (gs, gc) = diff.loss_and_grads(scene, cam, jax.random.key(0),
                                         target, spp=1)
    assert np.isfinite(float(loss))
    for k, g in {**gs, **gc}.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert float(np.abs(np.asarray(gs["tex_color0"])).sum()) > 0.0
