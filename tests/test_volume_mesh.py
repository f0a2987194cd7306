"""Triangle-mesh volume boundaries (VOL_MESH).

The reference's ``volumne`` wraps ANY hittable as the medium boundary
(src/volumne.h:9-21); its two-probe entry/exit (interval::universe, then
(entry+eps, inf)) is exact for convex closed boundaries. VOL_MESH matches
that contract with a batched line sweep: entry/exit = min/max t over the
volume's triangles. These tests pin (1) exact agreement with the analytic
box boundary on an identical geometry, (2) a brute-force NumPy oracle
implementing the reference's probe on a convex icosahedron, and (3) an
end-to-end render that actually scatters in the medium.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect


def _box_tris(a, b):
    """[12,3,3] triangle soup of the axis-aligned box [a, b] (outward CCW)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    x0, y0, z0 = a
    x1, y1, z1 = b
    c = np.array([[x0, y0, z0], [x1, y0, z0], [x0, y1, z0], [x1, y1, z0],
                  [x0, y0, z1], [x1, y0, z1], [x0, y1, z1], [x1, y1, z1]])
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for i, j, k, l in quads:
        tris.append([c[i], c[j], c[k]])
        tris.append([c[i], c[k], c[l]])
    return np.asarray(tris)


def _icosahedron(center, radius):
    """[20,3,3] unit icosahedron scaled/translated — convex, closed."""
    p = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
                  [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
                  [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1]], np.float64)
    v = v / np.linalg.norm(v[0]) * radius + np.asarray(center, np.float64)
    f = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
         (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
         (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
         (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    return v[np.array(f)]


def _rays(n, seed, aim, spread):
    """Rays from random origins aimed near ``aim`` (so most cross the
    medium), plus a wild tail that mostly misses."""
    rng = np.random.default_rng(seed)
    org = rng.uniform(-4, 4, (n, 3))
    target = np.asarray(aim) + rng.uniform(-spread, spread, (n, 3))
    dirs = target - org
    wild = rng.normal(size=(n, 3))
    dirs[::4] = wild[::4]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    u = rng.uniform(1e-4, 1.0, (n,))
    return org.astype(np.float32), dirs.astype(np.float32), u.astype(np.float32)


def test_mesh_box_equals_analytic_box():
    """A 12-triangle box boundary must reproduce the analytic VOL_BOX
    samples exactly (same uniforms, same density)."""
    a, b = (-1.0, -1.0, -5.0), (1.0, 1.0, -3.0)
    bm = SceneBuilder()
    bm.volume_mesh(_box_tris(a, b), 0.7, (1, 1, 1))
    sm = bm.build()
    ba = SceneBuilder()
    ba.volume_box(a, b, 0.7, (1, 1, 1))
    sa = ba.build()

    org, dirs, u = _rays(256, 0, (0, 0, -4), 1.5)
    t_surface = jnp.full((256,), 1e30)
    args = (jnp.asarray(org), jnp.asarray(dirs))
    uv = jnp.asarray(u)[:, None]
    tm_m, _, ok_m = isect.volume_sample(*args, sm.volumes, 1e-3, t_surface, uv)
    tm_a, _, ok_a = isect.volume_sample(*args, sa.volumes, 1e-3, t_surface, uv)
    np.testing.assert_array_equal(np.asarray(ok_m), np.asarray(ok_a))
    sel = np.asarray(ok_a)
    assert sel.sum() > 20  # the ray set genuinely exercises the medium
    np.testing.assert_allclose(np.asarray(tm_m)[sel], np.asarray(tm_a)[sel],
                               rtol=2e-4, atol=2e-4)


def test_mesh_volume_matches_numpy_oracle():
    """Convex icosahedron medium vs a brute-force NumPy implementation of
    the reference probe (src/volumne.h:21-36): entry = first line hit,
    exit = next hit after, scatter at entry + (-ln U / rho) / |d|."""
    tris = _icosahedron((0.3, -0.2, -2.0), 1.5)
    rho = 0.9
    b = SceneBuilder()
    b.volume_mesh(tris, rho, (1, 1, 1))
    s = b.build()

    org, dirs, u = _rays(512, 1, (0.3, -0.2, -2.0), 2.0)
    tmin = 1e-3
    t_surface = np.full((512,), 1e30, np.float32)
    t_dev, _, ok_dev = isect.volume_sample(
        jnp.asarray(org), jnp.asarray(dirs), s.volumes, tmin,
        jnp.asarray(t_surface), jnp.asarray(u)[:, None])

    # NumPy oracle: Moller-Trumbore over the full line, all 20 triangles
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    t_hits = np.full((512, 20), np.inf)
    for r in range(512):
        for k in range(20):
            pvec = np.cross(dirs[r], e2[k])
            det = e1[k] @ pvec
            if abs(det) < 1e-12:
                continue
            tvec = org[r] - v0[k]
            uu = (tvec @ pvec) / det
            qvec = np.cross(tvec, e1[k])
            vv = (dirs[r] @ qvec) / det
            if uu < 0 or vv < 0 or uu + vv > 1:
                continue
            t_hits[r, k] = (e2[k] @ qvec) / det
    finite = np.isfinite(t_hits)
    t1 = np.where(finite, t_hits, np.inf).min(axis=1)   # reference 1st probe
    t2 = np.where(finite, t_hits, -np.inf).max(axis=1)  # 2nd probe (convex)
    t1c = np.maximum(t1, tmin)
    t2c = np.minimum(t2, t_surface)
    span = (t1c < t2c) & np.isfinite(t1)
    dlen = np.linalg.norm(dirs, axis=-1)
    inside = (t2c - t1c) * dlen
    hit_d = -np.log(u) / rho
    ok_np = span & (hit_d <= inside)
    t_np = t1c + hit_d / dlen

    assert ok_np.sum() > 30
    np.testing.assert_array_equal(np.asarray(ok_dev), ok_np)
    np.testing.assert_allclose(np.asarray(t_dev)[ok_np], t_np[ok_np],
                               rtol=2e-4, atol=2e-4)


def test_mesh_smoke_renders_and_scatters():
    """End-to-end: a dense mesh-bounded smoke between camera and a light
    must attenuate the image relative to the same scene without it."""
    from cpu_ray_tracing_implementation_tpu.models import camera as cam
    from cpu_ray_tracing_implementation_tpu.models import integrator

    def build(with_smoke):
        b = SceneBuilder()
        lq = b.quad((-2, -2, -8), (4, 0, 0), (0, 4, 0), b.diffuse_light((8, 8, 8)))
        b.light(lq)
        if with_smoke:
            b.volume_mesh(_icosahedron((0, 0, -4), 1.8), 3.0, (0.2, 0.2, 0.2))
        c = cam.perspective(24, 1.0, (0, 0, 0), (0, 0, -4), 1, 60.0, 16, 4)
        return b.build(), c

    imgs = []
    for smoke in (False, True):
        s, c = build(smoke)
        imgs.append(np.asarray(integrator.render_image(s, c, jax.random.key(3))))
    assert np.isfinite(imgs[1]).all()
    # the smoke sits in front of the light: center pixels must dim
    assert imgs[1].mean() < imgs[0].mean() * 0.9
