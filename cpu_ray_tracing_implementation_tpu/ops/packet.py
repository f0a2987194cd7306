"""Tile-packet culled closest-hit: the TPU-shaped BVH traversal.

Why not per-ray node traversal? Measured on a v5e chip (tools/bvh_stats.py):
XLA row-gathers cost ~18 ms per [160k]-lane traversal step, and lockstep
executes the MAX visit count over all rays (93) while the MEAN is 6.9 —
per-ray pointer chasing is the wrong shape for this machine (ops/bvh.py
keeps that implementation as the oracle / an option). The chunk paths
(ops/chunked.py, ops/pallas_intersect.py) have the opposite problem: every
ray tests every chunk, and the [R, C] elementwise work is VPU-bound, so the
only way to go faster is to visit FEWER (ray, chunk) pairs.

This module restructures the reference's per-ray BVH descent
(src/bvh_node.h:49-58) as *packet traversal* at tile granularity:

 - rays are processed in coherent tiles of TILE (camera rays arrive in
   pixel order, so a tile spans a small frustum);
 - per tile, one dense fused pass computes, for every chunk, whether ANY
   ray's [tmin, tmax] slab interval crosses the chunk AABB and the smallest
   entry t — [K] reductions over the tile, no [T,K] materialization, no
   gathers (the chunk AABBs come straight from the SAH builder's
   depth-first chunk order, utils/accel.py, which is what makes them tight);
 - hit chunks are visited front-to-back (argsort by near t) in a
   ``lax.while_loop`` whose trip count is the ACTUAL hit count for this
   tile — no lockstep with other tiles (``lax.map`` runs tiles serially);
 - each visit dynamic-slices one chunk (contiguous — cheap, unlike a
   gather) and runs the dense MXU/VPU intersection for tile x chunk;
 - the loop exits early once the nearest unvisited chunk starts beyond
   every ray's current closest hit (the same interval tightening the
   reference gets from its right-subtree clamp, src/bvh_node.h:53-57).

Differentiability: forward-only + custom VJP running the XLA chunk scan
backward (same pattern as ops/pallas_intersect.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct  # noqa: F401  (payload dataclasses come from chunked)

from cpu_ray_tracing_implementation_tpu.ops import chunked as ch
from cpu_ray_tracing_implementation_tpu.ops import tables as tbl

INF = jnp.inf
TILE = 2048  # rays per packet: smaller = tighter frusta, more map steps


def _pad_tiles(arrs, R, tile):
    """Pad leading dim to a tile multiple and reshape to [G, tile, ...]."""
    g = (R + tile - 1) // tile
    out = []
    for a in arrs:
        pad = g * tile - R
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        out.append(a.reshape((g, tile) + a.shape[1:]))
    return out


def _chunk_hits(org, dirs, lo, hi, tmin, tmax):
    """Per-chunk (hit_any [K], near_min [K]) for one ray tile.

    The [T,K,3] slab arithmetic fuses into the K-wise reductions, so only
    [K] lives in HBM.
    """
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-20, dirs, 1e-20)   # [T,3]
    t0 = (lo[None, :, :] - org[:, None, :]) * inv[:, None, :]   # [T,K,3]
    t1 = (hi[None, :, :] - org[:, None, :]) * inv[:, None, :]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)                # [T,K]
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    ok = (near <= far) & (far >= tmin) & (near <= tmax)
    hit_any = jnp.any(ok, axis=0)                               # [K]
    near_c = jnp.min(jnp.where(ok, jnp.maximum(near, tmin), INF), axis=0)
    return hit_any, near_c


def _visit_order(hit_any, near_c):
    """Front-to-back chunk visit order + per-slot entry t (+inf = done)."""
    keyed = jnp.where(hit_any, near_c, INF)
    order = jnp.argsort(keyed)          # [K] chunk ids, nearest first
    return order, jnp.sort(keyed)


def _planar_tile(org, dirs, chunks: ch.PlanarChunks, tmin, triangle, tmax):
    """Closest planar hit for one [T] ray tile."""
    T = org.shape[0]
    K, C = chunks.corner.shape[0], chunks.corner.shape[1]
    f32 = org.dtype
    hit_any, near_c = _chunk_hits(org, dirs, chunks.lo, chunks.hi, tmin, tmax)
    order, near_sorted = _visit_order(hit_any, near_c)

    t_init = jnp.minimum(jnp.full((T,), INF, f32), tmax)
    init = (jnp.int32(0), t_init,
            jnp.zeros((T, 3), f32), jnp.zeros((T,), f32),
            jnp.zeros((T,), f32), jnp.zeros((T,), jnp.int32),
            jnp.zeros((T,), jnp.int32))

    def cond(state):
        s, t_best = state[0], state[1]
        return (s < K) & (near_sorted[s] <= jnp.max(t_best)) \
            & jnp.isfinite(near_sorted[s])

    def body(state):
        s, t_best, n_b, u_b, v_b, m_b, p_b = state
        k = order[s]
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k, 1, axis=0)[0]
        corner, eu, ev = sl(chunks.corner), sl(chunks.eu), sl(chunks.ev)
        active = sl(chunks.active)
        mat = sl(chunks.mat)
        ts, a, b, unorm = ch._planar_chunk_ts(
            org, dirs, corner, eu, ev, active, tmin, t_best, triangle)
        t_c = jnp.min(ts, axis=-1)
        idx = jnp.argmin(ts, axis=-1)
        oh = tbl.onehot(idx, C)
        better = t_c < t_best
        mm = lambda tab: jnp.matmul(oh, tab, precision="highest")
        return (s + 1,
                jnp.where(better, t_c, t_best),
                jnp.where(better[:, None], mm(unorm), n_b),
                jnp.where(better, jnp.sum(oh * a, axis=-1), u_b),
                jnp.where(better, jnp.sum(oh * b, axis=-1), v_b),
                jnp.where(better,
                          jnp.round(mm(mat.astype(f32)[:, None]))[:, 0]
                          .astype(jnp.int32), m_b),
                jnp.where(better, k * C + idx, p_b))

    _, t, n, u, v, m, p = jax.lax.while_loop(cond, body, init)
    return jnp.where(t < t_init, t, INF), n, u, v, m, p


def planar_closest_packet(org, dirs, chunks: ch.PlanarChunks, tmin,
                          triangle: bool, tmax=INF, tile: int = TILE):
    """Drop-in for ops.chunked.planar_closest (forward only).

    Returns (t [R], (unorm [R,3], u [R], v [R], mat [R]))."""
    R = org.shape[0]
    tile = min(tile, max(R, 1))
    org_t, dirs_t = _pad_tiles([org, dirs], R, tile)

    def per_tile(xs):
        o, d = xs
        return _planar_tile(o, d, chunks, tmin, triangle, tmax)

    t, n, u, v, m, p = jax.lax.map(per_tile, (org_t, dirs_t))
    flat = lambda a: a.reshape((-1,) + a.shape[2:])[:R]
    return flat(t), (flat(n), flat(u), flat(v), flat(m), flat(p))


def _sphere_tile(org, dirs, time, chunks: ch.SphereChunks, tmin, tmax):
    T = org.shape[0]
    K, C = chunks.rad.shape
    f32 = org.dtype
    hit_any, near_c = _chunk_hits(org, dirs, chunks.lo, chunks.hi, tmin, tmax)
    order, near_sorted = _visit_order(hit_any, near_c)

    t_init = jnp.minimum(jnp.full((T,), INF, f32), tmax)
    init = (jnp.int32(0), t_init,
            jnp.zeros((T, 3), f32), jnp.ones((T,), f32),
            jnp.zeros((T,), jnp.int32))

    def cond(state):
        s, t_best = state[0], state[1]
        return (s < K) & (near_sorted[s] <= jnp.max(t_best)) \
            & jnp.isfinite(near_sorted[s])

    def body(state):
        s, t_best, ctr_b, rad_b, m_b = state
        k = order[s]
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k, 1, axis=0)[0]
        c0, c1, rad = sl(chunks.c0), sl(chunks.c1), sl(chunks.rad)
        active, mat = sl(chunks.active), sl(chunks.mat)
        ts = ch._sphere_chunk_ts(org, dirs, time, c0, c1, rad, active,
                                 tmin, t_best)
        t_c = jnp.min(ts, axis=-1)
        idx = jnp.argmin(ts, axis=-1)
        oh = tbl.onehot(idx, C)
        better = t_c < t_best
        mm = lambda tab: jnp.matmul(oh, tab, precision="highest")
        c0_w, c1_w = mm(c0), mm(c1)
        ctr_c = c0_w + time[:, None] * (c1_w - c0_w)
        return (s + 1,
                jnp.where(better, t_c, t_best),
                jnp.where(better[:, None], ctr_c, ctr_b),
                jnp.where(better,
                          jnp.maximum(mm(rad[:, None])[:, 0], 1e-20), rad_b),
                jnp.where(better,
                          jnp.round(mm(mat.astype(f32)[:, None]))[:, 0]
                          .astype(jnp.int32), m_b))

    _, t, ctr, rad, m = jax.lax.while_loop(cond, body, init)
    return jnp.where(t < t_init, t, INF), ctr, rad, m


def sphere_closest_packet(org, dirs, time, chunks: ch.SphereChunks, tmin,
                          tmax=INF, tile: int = TILE):
    """Drop-in for ops.chunked.sphere_closest (forward only).

    Returns (t [R], (center_at_t [R,3], rad [R], mat [R]))."""
    R = org.shape[0]
    tile = min(tile, max(R, 1))
    org_t, dirs_t, time_t = _pad_tiles([org, dirs, time], R, tile)

    def per_tile(xs):
        o, d, tm = xs
        return _sphere_tile(o, d, tm, chunks, tmin, tmax)

    t, ctr, rad, m = jax.lax.map(per_tile, (org_t, dirs_t, time_t))
    flat = lambda a: a.reshape((-1,) + a.shape[2:])[:R]
    return flat(t), (flat(ctr), flat(rad), flat(m))


# ------------------------------------------------------------- autodiff glue
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def planar_closest_accel(org, dirs, chunks, tmin, triangle, tmax=INF):
    """Packet forward + XLA chunk-scan backward: the differentiable default
    accelerator for large planar tables."""
    return planar_closest_packet(org, dirs, chunks, tmin, triangle, tmax=tmax)


def _planar_fwd(org, dirs, chunks, tmin, triangle, tmax):
    out = planar_closest_packet(org, dirs, chunks, tmin, triangle, tmax=tmax)
    return out, (org, dirs, chunks)


def _planar_bwd(tmin, triangle, tmax, res, ct):
    org, dirs, chunks = res
    _, vjp = jax.vjp(
        lambda o, d, c: ch.planar_closest(o, d, c, tmin, triangle, tmax=tmax),
        org, dirs, chunks)
    return vjp(ct)


planar_closest_accel.defvjp(_planar_fwd, _planar_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sphere_closest_accel(org, dirs, time, chunks, tmin, tmax=INF):
    """Packet forward + XLA chunk-scan backward for sphere chunks."""
    return sphere_closest_packet(org, dirs, time, chunks, tmin, tmax=tmax)


def _sphere_fwd(org, dirs, time, chunks, tmin, tmax):
    out = sphere_closest_packet(org, dirs, time, chunks, tmin, tmax=tmax)
    return out, (org, dirs, time, chunks)


def _sphere_bwd(tmin, tmax, res, ct):
    org, dirs, time, chunks = res
    _, vjp = jax.vjp(
        lambda o, d, tm, c: ch.sphere_closest(o, d, tm, c, tmin, tmax=tmax),
        org, dirs, time, chunks)
    return vjp(ct)


sphere_closest_accel.defvjp(_sphere_fwd, _sphere_bwd)
