"""Batched ray-primitive intersection over flat scene tables.

TPU re-design of the reference's virtual ``hittable::hit`` dispatch + linear
``hittable_list`` scan (src/hittable_list.h:20-31): rays are a [R] batch, each
primitive type is intersected as one dense [R, N] vectorized test, the
closest hit is a masked argmin, and shading attributes are computed only for
the winning primitive of each type. Constant-density volumes
(src/volumne.h:18-46) participate as an RNG-consuming sampling step clipped
by the closest surface hit.

This brute-force path is the correctness oracle and is optimal for small
scenes; large triangle/sphere scenes use the BVH path (ops/bvh.py) behind the
same ``Hit`` interface.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm
from cpu_ray_tracing_implementation_tpu.ops.sampling import PI

INF = jnp.inf
BIG = 1e30


@struct.dataclass
class Hit:
    valid: jnp.ndarray   # [R] bool
    t: jnp.ndarray       # [R]
    p: jnp.ndarray       # [R,3]
    normal: jnp.ndarray  # [R,3] face-forward unit normal
    front: jnp.ndarray   # [R] bool (dot(ray_dir, outward_normal) < 0)
    u: jnp.ndarray       # [R]
    v: jnp.ndarray       # [R]
    mat: jnp.ndarray     # [R] int32


def _safe_div(num, den, fallback):
    ok = jnp.abs(den) > 1e-20
    den_safe = jnp.where(ok, den, 1.0)
    return jnp.where(ok, num / den_safe, fallback)


def _in_range(t, tmin, tmax):
    return (t >= tmin) & (t <= tmax)


# ------------------------------------------------------------------ spheres
def sphere_ts(org, dirs, time, sph, tmin, tmax):
    """[R,S] hit parameter (inf = miss). Quadratic as in src/sphere.h:40-74,
    with the moving-sphere center lerped by ray time (src/sphere.h:83)."""
    center = sph.c0[None, :, :] + time[:, None, None] * (sph.c1 - sph.c0)[None, :, :]
    oc = org[:, None, :] - center                       # [R,S,3]
    a = vm.dot(dirs, dirs)[:, None]                     # [R,1]
    b = 2.0 * vm.dot(dirs[:, None, :], oc)              # [R,S]
    c = vm.dot(oc, oc) - (sph.rad * sph.rad)[None, :]
    disc = b * b - 4.0 * a * c
    has = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(has, disc, 1.0))         # double-where: AD-safe at disc<=0
    t0 = (-b - sqrtd) / (2.0 * a)
    t1 = (-b + sqrtd) / (2.0 * a)
    t = jnp.where(_in_range(t0, tmin, tmax), t0,
                  jnp.where(_in_range(t1, tmin, tmax), t1, INF))
    return jnp.where(has & sph.active[None, :], t, INF)


def sphere_uv(n):
    """Spherical UV from the unit outward normal (src/sphere.h:90-95)."""
    theta = jnp.arccos(jnp.clip(-n[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-n[..., 2], n[..., 0]) + PI
    return phi / (2.0 * PI), theta / PI


def sphere_shading(org, dirs, time, sph, idx, t):
    """Shading attrs for the winning sphere per ray. The outward normal uses
    the time-lerped center — fixing the reference's static-center bug
    (src/sphere.h:69, SURVEY.md appendix item 2)."""
    c0 = sph.c0[idx]
    c1 = sph.c1[idx]
    center = c0 + time[:, None] * (c1 - c0)
    rad = sph.rad[idx]
    p = org + t[:, None] * dirs
    outward = (p - center) / jnp.maximum(rad, 1e-20)[:, None]
    front = vm.dot(dirs, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)
    u, v = sphere_uv(outward)
    return p, normal, front, u, v, sph.mat[idx]


# ------------------------------------------------------------------ quads
def quad_ts(org, dirs, qds, tmin, tmax):
    """[R,Q] hit parameter for planar quads (src/quad.h:30-52)."""
    n = vm.cross(qds.eu, qds.ev)                        # [Q,3]
    unorm = vm.normalize(n)
    d_plane = vm.dot(unorm, qds.corner)                 # [Q]
    denom = vm.dot(dirs[:, None, :], unorm[None, :, :])  # [R,Q]
    t = _safe_div(d_plane[None, :] - vm.dot(unorm[None, :, :], org[:, None, :]), denom, INF)
    p = org[:, None, :] + t[..., None] * dirs[:, None, :]
    q = p - qds.corner[None, :, :]
    w = n / jnp.maximum(vm.dot(n, n), 1e-20)[:, None]   # [Q,3]
    a = vm.dot(w[None, :, :], vm.cross(q, qds.ev[None, :, :]))
    b = vm.dot(w[None, :, :], vm.cross(qds.eu[None, :, :], q))
    interior = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    ok = _in_range(t, tmin, tmax) & interior & qds.active[None, :]
    return jnp.where(ok, t, INF)


def quad_shading(org, dirs, qds, idx, t):
    corner = qds.corner[idx]
    eu = qds.eu[idx]
    ev = qds.ev[idx]
    n = vm.cross(eu, ev)
    unorm = vm.normalize(n)
    p = org + t[:, None] * dirs
    q = p - corner
    w = n / jnp.maximum(vm.dot(n, n), 1e-20)[:, None]
    u = vm.dot(w, vm.cross(q, ev))
    v = vm.dot(w, vm.cross(eu, q))
    front = vm.dot(dirs, unorm) < 0.0
    normal = jnp.where(front[:, None], unorm, -unorm)
    return p, normal, front, u, v, qds.mat[idx]


# ------------------------------------------------------------------ triangles
def tri_ts(org, dirs, tri, tmin, tmax):
    """[R,T] Moller-Trumbore (src/triangle.h:8-15,27-40)."""
    e1 = tri.v1 - tri.v0                                # [T,3]
    e2 = tri.v2 - tri.v0
    s = org[:, None, :] - tri.v0[None, :, :]            # [R,T,3]
    s1 = vm.cross(dirs[:, None, :], e2[None, :, :])     # [R,T,3]
    s2 = vm.cross(s, e1[None, :, :])
    denom = vm.dot(s1, e1[None, :, :])                  # [R,T]
    t = _safe_div(vm.dot(s2, e2[None, :, :]), denom, INF)
    b0 = _safe_div(vm.dot(s1, s), denom, -1.0)
    b1 = _safe_div(vm.dot(s2, dirs[:, None, :]), denom, -1.0)
    ok = (_in_range(t, tmin, tmax)
          & (b0 >= 0.0) & (b1 >= 0.0) & (b0 + b1 <= 1.0)
          & tri.active[None, :])
    return jnp.where(ok, t, INF)


def tri_shading(org, dirs, tri, idx, t):
    v0 = tri.v0[idx]
    e1 = tri.v1[idx] - v0
    e2 = tri.v2[idx] - v0
    outward = vm.normalize(vm.cross(e1, e2))            # flat geometric normal, no UV
    p = org + t[:, None] * dirs
    front = vm.dot(dirs, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)
    zero = jnp.zeros_like(t)
    return p, normal, front, zero, zero, tri.mat[idx]


# ------------------------------------------------------------------ volumes
def volume_sample(org, dirs, vols, tmin, t_surface, u_vol):
    """Stochastic volume hits clipped by the closest surface (src/volumne.h).

    Returns (t_v [R], vidx [R], valid [R]); ``u_vol`` is [R, V] uniforms, one
    per volume, replacing the reference's shared-state rand() draw.
    """
    # ray in each volume's object frame: row-vector times object->world matrix
    rel = org[:, None, :] - vols.center[None, :, :]      # [R,V,3]
    ol = jnp.einsum("rvk,vkl->rvl", rel, vols.rot)       # R^T applied
    dl = jnp.einsum("rk,vkl->rvl", dirs, vols.rot)

    # entry/exit of the *line* (negative t allowed: the reference probes with
    # interval::universe first, src/volumne.h:21-22)
    # box boundary: slab test against [-half, half]
    ok = jnp.abs(dl) > 1e-12
    dl_safe = jnp.where(ok, dl, 1.0)
    lo = jnp.where(ok, (-vols.half[None] - ol) / dl_safe,
                   jnp.where(jnp.abs(ol) <= vols.half[None], -BIG, BIG))
    hi = jnp.where(ok, (vols.half[None] - ol) / dl_safe,
                   jnp.where(jnp.abs(ol) <= vols.half[None], BIG, -BIG))
    near = jnp.minimum(lo, hi)
    far = jnp.maximum(lo, hi)
    t1_box = jnp.max(near, axis=-1)
    t2_box = jnp.min(far, axis=-1)

    # sphere boundary: quadratic, both roots
    a = vm.dot(dirs, dirs)[:, None]
    b = 2.0 * vm.dot(dirs[:, None, :], rel)
    c = vm.dot(rel, rel) - (vols.half[..., 0] ** 2)[None, :]
    disc = b * b - 4.0 * a * c
    has = disc > 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))
    t1_sph = jnp.where(has, (-b - sq) / (2.0 * a), BIG)
    t2_sph = jnp.where(has, (-b + sq) / (2.0 * a), -BIG)

    is_box = (vols.kind == 0)[None, :]
    t1 = jnp.where(is_box, t1_box, t1_sph)
    t2 = jnp.where(is_box, t2_box, t2_sph)

    # clamp to [tmin, closest surface] (src/volumne.h:25-29)
    t1c = jnp.maximum(t1, tmin)
    t2c = jnp.minimum(t2, t_surface[:, None])
    span_ok = (t1c < t2c) & vols.active[None, :]

    dlen = vm.length(dirs)[:, None]
    dist_inside = (t2c - t1c) * dlen
    # -log(U)/rho scatter distance (src/volumne.h:36); U==0 -> +inf -> no hit
    hit_dist = vols.neg_inv_density[None, :] * jnp.log(jnp.maximum(u_vol, 1e-38))
    vhit = span_ok & (hit_dist <= dist_inside)
    t_v = jnp.where(vhit, t1c + hit_dist / dlen, INF)

    # min + argmin as two reductions: take_along_axis lowers to a serialized
    # per-row gather on TPU (~500x slower than the reduction)
    vidx = jnp.argmin(t_v, axis=-1)
    t_best = jnp.min(t_v, axis=-1)
    return t_best, vidx, jnp.isfinite(t_best)


# ------------------------------------------------------------------ combined
def intersect_brute(scene, org, dirs, time, tmin, u_vol, tmax=INF):
    """Closest hit across all primitive tables -> Hit. ``u_vol``: [R, V]."""
    ts_s = sphere_ts(org, dirs, time, scene.spheres, tmin, tmax)
    ts_q = quad_ts(org, dirs, scene.quads, tmin, tmax)
    ts_t = tri_ts(org, dirs, scene.tris, tmin, tmax)

    def best(ts):
        # two reductions, NOT take_along_axis (serialized row-gather on TPU)
        return jnp.min(ts, axis=-1), jnp.argmin(ts, axis=-1)

    t_s, i_s = best(ts_s)
    t_q, i_q = best(ts_q)
    t_t, i_t = best(ts_t)

    t_surface = jnp.minimum(jnp.minimum(t_s, t_q), t_t)
    t_v, i_v, v_valid = volume_sample(org, dirs, scene.volumes, tmin, t_surface, u_vol)

    t_all = jnp.stack([t_s, t_q, t_t, t_v], axis=-1)    # [R,4]
    which = jnp.argmin(t_all, axis=-1)                  # 0 sph, 1 quad, 2 tri, 3 vol
    t = jnp.min(t_all, axis=-1)
    valid = jnp.isfinite(t)

    p_s, n_s, f_s, u_s, v_s, m_s = sphere_shading(org, dirs, time, scene.spheres, i_s,
                                                  jnp.where(jnp.isfinite(t_s), t_s, 0.0))
    p_q, n_q, f_q, u_q, v_q, m_q = quad_shading(org, dirs, scene.quads, i_q,
                                                jnp.where(jnp.isfinite(t_q), t_q, 0.0))
    p_t, n_t, f_t, u_t, v_t, m_t = tri_shading(org, dirs, scene.tris, i_t,
                                               jnp.where(jnp.isfinite(t_t), t_t, 0.0))
    # volume record: arbitrary normal/front_face (src/volumne.h:42-43)
    t_v_safe = jnp.where(jnp.isfinite(t_v), t_v, 0.0)
    p_v = org + t_v_safe[:, None] * dirs
    n_v = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], org.dtype), org.shape)
    m_v = scene.volumes.mat[i_v]

    def sel(k, a, b, c, d):
        m = which[..., None] if a.ndim == 2 else which
        return jnp.where(m == 0, a, jnp.where(m == 1, b, jnp.where(m == 2, c, d)))

    p = sel("p", p_s, p_q, p_t, p_v)
    normal = sel("n", n_s, n_q, n_t, n_v)
    front = sel("f", f_s, f_q, f_t, jnp.ones_like(f_s))
    uu = sel("u", u_s, u_q, u_t, jnp.zeros_like(u_s))
    vv = sel("v", v_s, v_q, v_t, jnp.zeros_like(v_s))
    mat = sel("m", m_s, m_q, m_t, m_v)

    return Hit(valid=valid, t=t, p=p, normal=normal, front=front, u=uu, v=vv,
               mat=jnp.where(valid, mat, 0))
