"""Pallas TPU kernel: fused closest-hit over chunked planar primitives.

The XLA chunk-scan path (ops/chunked.py) materializes [R,C] intermediates in
HBM between ops; this kernel is the flash-attention-style fusion of the same
math: a 2-D grid over (ray tiles, primitive chunks) where the running
closest-hit state lives in the revisited VMEM output block, the six
ray-constant x primitive-constant contractions run on the MXU per
(tile, chunk) cell, and nothing of size [R,N] ever touches HBM.

Layouts are transposed for the VPU: rays arrive as [8, R] (rows: org xyz,
dir xyz, time, pad) and hit state leaves as [8, R] (rows: t, normal xyz,
u, v, mat, valid) so the ray axis sits in the 128-wide lane dimension.

Forward-only: the autodiff paths use the XLA scan (a custom VJP would
duplicate the estimator); select with ``planar_closest_pallas`` where
gradients are not required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpu_ray_tracing_implementation_tpu.ops import chunked as ch
from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm

BIG = 1e30
TILE_R = 1024
# Pallas grid cap. Round 1 capped this at 512 after an unexplained TPU
# worker fault; tools/pallas_cap_probe.py (round 2, v5e chip) ran the
# compiled kernel at 600/1024/2016/2500 chunks with parity vs the XLA scan
# — no fault (the round-1 crash was tunnel-queue flakiness, not the grid).
# 8192 chunks = 1M primitives; beyond that take the XLA scan.
MAX_PALLAS_CHUNKS = 8192

# prim-constant pack rows (built host/trace-side from PlanarChunks)
ROW_UNORM = 0     # 0:3   plane unit normal
ROW_EVW = 3       # 3:6   ev x w   (a = q . evw)
ROW_WEU = 6       # 6:9   w x eu   (b = q . weu)
ROW_DPLANE = 9    # unorm . corner
ROW_CA = 10       # corner . evw
ROW_CB = 11       # corner . weu
ROW_ACTIVE = 12   # 1.0 / 0.0
ROW_MAT = 13      # material id as f32
NROWS = 16        # padded

# output rows
OUT_T = 0
OUT_NX, OUT_NY, OUT_NZ = 1, 2, 3
OUT_U, OUT_V = 4, 5
OUT_MAT = 6
OUT_VALID = 7


def pack_prim_constants(chunks: ch.PlanarChunks) -> jnp.ndarray:
    """[K, NROWS, C] constant pack from chunk-major planar tables."""
    corner, eu, ev = chunks.corner, chunks.eu, chunks.ev      # [K,C,3]
    n = vm.cross(eu, ev)
    unorm = vm.normalize(n)
    w = n / jnp.maximum(vm.dot(n, n), 1e-20)[..., None]
    evw = vm.cross(ev, w)
    weu = vm.cross(w, eu)
    K, C = corner.shape[0], corner.shape[1]
    pack = jnp.zeros((K, NROWS, C), jnp.float32)
    pack = pack.at[:, ROW_UNORM:ROW_UNORM + 3].set(jnp.swapaxes(unorm, 1, 2))
    pack = pack.at[:, ROW_EVW:ROW_EVW + 3].set(jnp.swapaxes(evw, 1, 2))
    pack = pack.at[:, ROW_WEU:ROW_WEU + 3].set(jnp.swapaxes(weu, 1, 2))
    pack = pack.at[:, ROW_DPLANE].set(vm.dot(unorm, corner))
    pack = pack.at[:, ROW_CA].set(vm.dot(corner, evw))
    pack = pack.at[:, ROW_CB].set(vm.dot(corner, weu))
    pack = pack.at[:, ROW_ACTIVE].set(chunks.active.astype(jnp.float32))
    pack = pack.at[:, ROW_MAT].set(chunks.mat.astype(jnp.float32))
    return pack


def _kernel(rays_ref, prim_ref, tmin_ref, out_ref, *, triangle: bool, C: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[OUT_T, :] = jnp.full((out_ref.shape[1],),
                                     jnp.minimum(BIG, tmin_ref[1]), jnp.float32)

    org = rays_ref[0:3, :]            # [3, TILE_R]
    dirs = rays_ref[3:6, :]
    tmin = tmin_ref[0]

    unorm = prim_ref[0, ROW_UNORM:ROW_UNORM + 3, :]   # [3, C]
    evw = prim_ref[0, ROW_EVW:ROW_EVW + 3, :]
    weu = prim_ref[0, ROW_WEU:ROW_WEU + 3, :]
    d_plane = prim_ref[0, ROW_DPLANE, :]              # [C]
    c_a = prim_ref[0, ROW_CA, :]
    c_b = prim_ref[0, ROW_CB, :]
    active = prim_ref[0, ROW_ACTIVE, :]
    mats = prim_ref[0, ROW_MAT, :]

    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    o_n = dot(org, unorm)             # [TILE_R, C]
    d_n = dot(dirs, unorm)
    hit_plane = jnp.abs(d_n) > 1e-20
    t = jnp.where(hit_plane,
                  (d_plane[None, :] - o_n) / jnp.where(hit_plane, d_n, 1.0), BIG)

    # clip: t sentinel x sliver-primitive constants can overflow to inf and
    # the one-hot payload select would produce 0*inf = NaN
    a = jnp.clip(dot(org, evw) + t * dot(dirs, evw) - c_a[None, :], -BIG, BIG)
    b = jnp.clip(dot(org, weu) + t * dot(dirs, weu) - c_b[None, :], -BIG, BIG)
    if triangle:
        interior = (a >= 0.0) & (b >= 0.0) & (a + b <= 1.0)
    else:
        interior = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    t_prev = out_ref[OUT_T, :]        # [TILE_R]
    ok = (hit_plane & (t >= tmin) & (t < t_prev[:, None]) & interior
          & (active[None, :] > 0.5))
    ts = jnp.where(ok, t, BIG)

    t_c = jnp.min(ts, axis=1)                       # [TILE_R]
    idx = jnp.argmin(ts, axis=1)
    oh = (idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
          ).astype(jnp.float32)                     # [TILE_R, C]
    ohdot = functools.partial(jax.lax.dot_general,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    n_sel = ohdot(oh, unorm)                        # [TILE_R, 3]
    u_sel = jnp.sum(oh * a, axis=1)
    v_sel = jnp.sum(oh * b, axis=1)
    m_sel = jnp.sum(oh * mats[None, :], axis=1)

    better = t_c < t_prev
    out_ref[OUT_T, :] = jnp.where(better, t_c, t_prev)
    out_ref[OUT_NX, :] = jnp.where(better, n_sel[:, 0], out_ref[OUT_NX, :])
    out_ref[OUT_NY, :] = jnp.where(better, n_sel[:, 1], out_ref[OUT_NY, :])
    out_ref[OUT_NZ, :] = jnp.where(better, n_sel[:, 2], out_ref[OUT_NZ, :])
    out_ref[OUT_U, :] = jnp.where(better, u_sel, out_ref[OUT_U, :])
    out_ref[OUT_V, :] = jnp.where(better, v_sel, out_ref[OUT_V, :])
    out_ref[OUT_MAT, :] = jnp.where(better, m_sel, out_ref[OUT_MAT, :])
    out_ref[OUT_VALID, :] = jnp.where(better, 1.0, out_ref[OUT_VALID, :])


@functools.partial(jax.jit, static_argnames=("triangle", "interpret"))
def planar_closest_pallas(org, dirs, chunks: ch.PlanarChunks, tmin,
                          triangle: bool = False, interpret: bool = False,
                          tmax=BIG):
    """Drop-in for ops.chunked.planar_closest (forward only).

    Returns (t [R], (unorm [R,3], u [R], v [R], mat [R]))."""
    R = org.shape[0]
    K, C = chunks.corner.shape[0], chunks.corner.shape[1]
    R_pad = ((R + TILE_R - 1) // TILE_R) * TILE_R
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the interpreter

    rays = jnp.zeros((8, R_pad), jnp.float32)
    rays = rays.at[0:3, :R].set(org.T)
    rays = rays.at[3:6, :R].set(dirs.T)

    pack = pack_prim_constants(chunks)
    tmin_arr = jnp.stack([jnp.asarray(tmin, jnp.float32),
                          jnp.minimum(jnp.asarray(tmax, jnp.float32), BIG)])

    out = pl.pallas_call(
        functools.partial(_kernel, triangle=triangle, C=C),
        out_shape=jax.ShapeDtypeStruct((8, R_pad), jnp.float32),
        grid=(R_pad // TILE_R, K),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NROWS, C), lambda i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_R), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, pack, tmin_arr)

    out = out[:, :R]
    t = jnp.where(out[OUT_VALID] > 0.5, out[OUT_T], jnp.inf)
    unorm = out[OUT_NX:OUT_NZ + 1].T
    # pid is not carried through the kernel (out rows are full at 8);
    # scenes with per-vertex attributes route around the pallas path
    return t, (unorm, out[OUT_U], out[OUT_V],
               jnp.round(out[OUT_MAT]).astype(jnp.int32),
               jnp.zeros((R,), jnp.int32))


# ---------------------------------------------------------------- autodiff
def fits_pallas(chunks) -> bool:
    """True when the chunk count is within the kernel's validated grid size."""
    k = (chunks.rad.shape[0] if hasattr(chunks, "rad")
         else chunks.corner.shape[0])
    return k <= MAX_PALLAS_CHUNKS


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def planar_closest_fused(org, dirs, chunks, tmin, triangle, tmax=BIG):
    """Pallas forward + XLA-scan backward: differentiable drop-in for
    ops.chunked.planar_closest with the fused kernel on the forward pass."""
    return planar_closest_pallas(org, dirs, chunks, tmin, triangle=triangle,
                                 tmax=tmax)


def _fused_fwd(org, dirs, chunks, tmin, triangle, tmax):
    out = planar_closest_pallas(org, dirs, chunks, tmin, triangle=triangle,
                                tmax=tmax)
    return out, (org, dirs, chunks)


def _fused_bwd(tmin, triangle, tmax, res, ct):
    org, dirs, chunks = res
    _, vjp = jax.vjp(
        lambda o, d, c: ch.planar_closest(o, d, c, tmin, triangle, tmax=tmax),
        org, dirs, chunks)
    return vjp(ct)


planar_closest_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------- spheres
# sphere constant pack rows
SROW_C0 = 0       # 0:3
SROW_DC = 3       # 3:6  c1 - c0 (motion)
SROW_C0C0 = 6
SROW_C0DC = 7
SROW_DCDC = 8
SROW_RAD2 = 9
SROW_RAD = 10
SROW_ACTIVE = 11
SROW_MAT = 12
SNROWS = 16

# sphere output rows: t, center xyz (at ray time), rad, mat, valid
SOUT_T = 0
SOUT_CX, SOUT_CY, SOUT_CZ = 1, 2, 3
SOUT_RAD = 4
SOUT_MAT = 5
SOUT_VALID = 6


def pack_sphere_constants(chunks: ch.SphereChunks) -> jnp.ndarray:
    """[K, SNROWS, C] constant pack from chunk-major sphere tables."""
    c0, c1, rad = chunks.c0, chunks.c1, chunks.rad      # [K,C,3], [K,C]
    dc = c1 - c0
    K, C = rad.shape
    pack = jnp.zeros((K, SNROWS, C), jnp.float32)
    pack = pack.at[:, SROW_C0:SROW_C0 + 3].set(jnp.swapaxes(c0, 1, 2))
    pack = pack.at[:, SROW_DC:SROW_DC + 3].set(jnp.swapaxes(dc, 1, 2))
    pack = pack.at[:, SROW_C0C0].set(vm.dot(c0, c0))
    pack = pack.at[:, SROW_C0DC].set(vm.dot(c0, dc))
    pack = pack.at[:, SROW_DCDC].set(vm.dot(dc, dc))
    pack = pack.at[:, SROW_RAD2].set(rad * rad)
    pack = pack.at[:, SROW_RAD].set(rad)
    pack = pack.at[:, SROW_ACTIVE].set(chunks.active.astype(jnp.float32))
    pack = pack.at[:, SROW_MAT].set(chunks.mat.astype(jnp.float32))
    return pack


def _sphere_kernel(rays_ref, prim_ref, tmin_ref, out_ref, *, C: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[SOUT_T, :] = jnp.full((out_ref.shape[1],),
                                      jnp.minimum(BIG, tmin_ref[1]), jnp.float32)
        out_ref[SOUT_RAD, :] = jnp.ones((out_ref.shape[1],), jnp.float32)

    org = rays_ref[0:3, :]            # [3, TILE_R]
    dirs = rays_ref[3:6, :]
    tm = rays_ref[6, :]               # ray time (motion blur)
    tmin = tmin_ref[0]

    c0 = prim_ref[0, SROW_C0:SROW_C0 + 3, :]   # [3, C]
    dc = prim_ref[0, SROW_DC:SROW_DC + 3, :]
    c0c0 = prim_ref[0, SROW_C0C0, :]
    c0dc = prim_ref[0, SROW_C0DC, :]
    dcdc = prim_ref[0, SROW_DCDC, :]
    rad2 = prim_ref[0, SROW_RAD2, :]
    rad = prim_ref[0, SROW_RAD, :]
    active = prim_ref[0, SROW_ACTIVE, :]
    mats = prim_ref[0, SROW_MAT, :]

    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    d_c = dot(dirs, c0) + tm[:, None] * dot(dirs, dc)       # [TILE_R, C]
    o_c = dot(org, c0) + tm[:, None] * dot(org, dc)
    cc = (c0c0[None, :] + 2.0 * tm[:, None] * c0dc[None, :]
          + (tm * tm)[:, None] * dcdc[None, :])
    a = jnp.sum(dirs * dirs, axis=0)[:, None]               # [TILE_R, 1]
    oo = jnp.sum(org * org, axis=0)[:, None]
    do = jnp.sum(dirs * org, axis=0)[:, None]
    b = 2.0 * (do - d_c)
    c = oo - 2.0 * o_c + cc - rad2[None, :]
    disc = b * b - 4.0 * a * c
    has = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(has, disc, 1.0))
    a_safe = jnp.maximum(a, 1e-20)
    t0 = (-b - sqrtd) / (2.0 * a_safe)
    t1 = (-b + sqrtd) / (2.0 * a_safe)
    t_prev = out_ref[SOUT_T, :]
    in0 = (t0 >= tmin) & (t0 < t_prev[:, None])
    in1 = (t1 >= tmin) & (t1 < t_prev[:, None])
    t = jnp.where(in0, t0, jnp.where(in1, t1, BIG))
    ts = jnp.where(has & (active[None, :] > 0.5), t, BIG)

    t_c = jnp.min(ts, axis=1)
    idx = jnp.argmin(ts, axis=1)
    oh = (idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
          ).astype(jnp.float32)
    ohdot = functools.partial(jax.lax.dot_general,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    c0_sel = ohdot(oh, c0)                                  # [TILE_R, 3]
    dc_sel = ohdot(oh, dc)
    ctr = c0_sel + tm[:, None] * dc_sel
    rad_sel = jnp.sum(oh * rad[None, :], axis=1)
    m_sel = jnp.sum(oh * mats[None, :], axis=1)

    better = t_c < t_prev
    out_ref[SOUT_T, :] = jnp.where(better, t_c, t_prev)
    out_ref[SOUT_CX, :] = jnp.where(better, ctr[:, 0], out_ref[SOUT_CX, :])
    out_ref[SOUT_CY, :] = jnp.where(better, ctr[:, 1], out_ref[SOUT_CY, :])
    out_ref[SOUT_CZ, :] = jnp.where(better, ctr[:, 2], out_ref[SOUT_CZ, :])
    out_ref[SOUT_RAD, :] = jnp.where(better, jnp.maximum(rad_sel, 1e-20),
                                     out_ref[SOUT_RAD, :])
    out_ref[SOUT_MAT, :] = jnp.where(better, m_sel, out_ref[SOUT_MAT, :])
    out_ref[SOUT_VALID, :] = jnp.where(better, 1.0, out_ref[SOUT_VALID, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_closest_pallas(org, dirs, time, chunks: ch.SphereChunks, tmin,
                          interpret: bool = False, tmax=BIG):
    """Drop-in for ops.chunked.sphere_closest (forward only).

    Returns (t [R], (center_at_t [R,3], rad [R], mat [R], pid [R]))."""
    R = org.shape[0]
    K, C = chunks.rad.shape
    R_pad = ((R + TILE_R - 1) // TILE_R) * TILE_R
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the interpreter

    rays = jnp.zeros((8, R_pad), jnp.float32)
    rays = rays.at[0:3, :R].set(org.T)
    rays = rays.at[3:6, :R].set(dirs.T)
    rays = rays.at[6, :R].set(time)

    pack = pack_sphere_constants(chunks)
    tmin_arr = jnp.stack([jnp.asarray(tmin, jnp.float32),
                          jnp.minimum(jnp.asarray(tmax, jnp.float32), BIG)])

    out = pl.pallas_call(
        functools.partial(_sphere_kernel, C=C),
        out_shape=jax.ShapeDtypeStruct((8, R_pad), jnp.float32),
        grid=(R_pad // TILE_R, K),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SNROWS, C), lambda i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_R), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, pack, tmin_arr)

    out = out[:, :R]
    t = jnp.where(out[SOUT_VALID] > 0.5, out[SOUT_T], jnp.inf)
    center = out[SOUT_CX:SOUT_CZ + 1].T
    # pid is not carried through the kernel (like the planar kernel) — the
    # fused path keeps the chunk-scan backward, which needs no pid
    return t, (center, out[SOUT_RAD],
               jnp.round(out[SOUT_MAT]).astype(jnp.int32),
               jnp.zeros((R,), jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sphere_closest_fused(org, dirs, time, chunks, tmin, tmax=BIG):
    """Pallas forward + XLA-scan backward for sphere chunks."""
    return sphere_closest_pallas(org, dirs, time, chunks, tmin, tmax=tmax)


def _sfused_fwd(org, dirs, time, chunks, tmin, tmax):
    out = sphere_closest_pallas(org, dirs, time, chunks, tmin, tmax=tmax)
    return out, (org, dirs, time, chunks)


def _sfused_bwd(tmin, tmax, res, ct):
    org, dirs, time, chunks = res
    _, vjp = jax.vjp(
        lambda o, d, tm, c: ch.sphere_closest(o, d, tm, c, tmin, tmax=tmax),
        org, dirs, time, chunks)
    return vjp(ct)


sphere_closest_fused.defvjp(_sfused_fwd, _sfused_bwd)


# ----------------------------------------------- dense (small-scene) entry
# Small scenes (<= ops.chunked.DENSE_MAX primitives, e.g. the Cornell box's
# 17 quads) keep dense [N] tables and historically ran a pure-XLA [R,N]
# pass. These views re-shape a dense table as ONE lane-padded chunk so the
# same fused kernels above serve the small-scene path: the whole
# intersect+select for a bounce becomes one pallas_call with grid
# (R/TILE_R, 1) and no [R,N] intermediate in HBM. XLA lane-pads the dense
# [R,N] intermediates to 128 anyway, so the kernel's C=128 does no extra
# work — it only removes the HBM round-trips between the fused ops.
# Backward passes reuse the chunked XLA scan on the same 1-chunk view
# (identical math to the dense oracle; custom VJPs above).

def _one_chunk(vec3s, scalars, lo_pts, hi_pts, active):
    """([1,C,...] vec3 list, [1,C] scalar list, lo [1,3], hi [1,3])."""
    N = active.shape[0]
    C = -(-N // 128) * 128
    pad = ((0, C - N), (0, 0))
    v3 = [jnp.pad(x, pad)[None] for x in vec3s]
    sc = [jnp.pad(x, pad[0])[None] for x in scalars]
    m = active[:, None]
    lo = jnp.min(jnp.stack([jnp.min(jnp.where(m, p, jnp.inf), axis=0)
                            for p in lo_pts]), axis=0)[None]
    hi = jnp.max(jnp.stack([jnp.max(jnp.where(m, p, -jnp.inf), axis=0)
                            for p in hi_pts]), axis=0)[None]
    return v3, sc, lo, hi


def dense_planar_view(corner, eu, ev, mat, active) -> ch.PlanarChunks:
    """1-chunk PlanarChunks view of a dense quad/triangle table."""
    pts = [corner, corner + eu, corner + ev, corner + eu + ev]
    v3, sc, lo, hi = _one_chunk([corner, eu, ev], [mat, active], pts, pts,
                                active)
    return ch.PlanarChunks(corner=v3[0], eu=v3[1], ev=v3[2], mat=sc[0],
                           active=sc[1], lo=lo, hi=hi)


def dense_quad_view(quads) -> ch.PlanarChunks:
    return dense_planar_view(quads.corner, quads.eu, quads.ev, quads.mat,
                             quads.active)


def dense_tri_view(tris) -> ch.PlanarChunks:
    """Triangles in (corner, eu, ev) form — same mapping as the chunked
    build (eu = v1 - v0, ev = v2 - v0; interior test a+b <= 1)."""
    return dense_planar_view(tris.v0, tris.v1 - tris.v0, tris.v2 - tris.v0,
                             tris.mat, tris.active)


def dense_sphere_view(sph) -> ch.SphereChunks:
    r3 = sph.rad[:, None]
    v3, sc, lo, hi = _one_chunk(
        [sph.c0, sph.c1], [sph.rad, sph.mat, sph.active],
        [sph.c0 - r3, sph.c1 - r3], [sph.c0 + r3, sph.c1 + r3], sph.active)
    return ch.SphereChunks(c0=v3[0], c1=v3[1], rad=sc[0], mat=sc[1],
                           active=sc[2], lo=lo, hi=hi)


def use_pallas() -> bool:
    """Pallas path is on for TPU backends unless CRT_NO_PALLAS=1 (or the
    accel override CRT_ACCEL=chunked forces the pure-XLA scan)."""
    import os

    if os.environ.get("CRT_NO_PALLAS") == "1":
        return False
    if os.environ.get("CRT_ACCEL") == "chunked":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False
