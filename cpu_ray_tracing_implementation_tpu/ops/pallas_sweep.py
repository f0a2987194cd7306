"""Pallas TPU kernel: per-ray visit-list SWEEP with DMA row gathers.

The per-ray accelerator's sweep (ops/perray.py stage 3) is the reference
BVH descent's leaf loop (src/bvh_node.h:49-58) in batched form: per visit
slot, gather each ray's next chunk row from the fused [K, F*C] table and
intersect. As an XLA gather inside a while_loop it moves the colonnade's
3.7 GB/bounce at ~110-140 GB/s — slope-measured 34 ms of the 60 ms/bounce
intersect (tools/perray_profile.py, VERDICT r03 item 1) — because XLA
pipelines neither the gather with the intersect nor slot s+1's rows with
slot s's compute.

This kernel owns that pipeline: the fused table stays in HBM
(memory_space=ANY); each program takes a block of RB rays, copies its
[RB, V] visit ids into SMEM so the scalar core can address rows with
them, and runs the slot loop with double-buffered per-ray row DMAs —
slot s+1's RB copies are in flight while slot s's [RB, C] intersection
runs on the VPU.

MEASURED NEGATIVE RESULT (2026-08-20, one v5e chip) — this kernel is
OPT-IN (CRT_PALLAS_SWEEP=1) because it LOSES to the XLA gather it was
built to replace: per-ray row DMAs are scalar-issue-bound. One shared
semaphore: 3.3 M starts/s = 18 GB/s. Striped over NSEM semaphores
(parallel DMA queues): 8-way 60.6, 16-way 71.5, 32-way 58.1 GB/s —
a ~13 M issues/s plateau (~78 ns/issue in the scalar fori_loop), below
XLA's 75-88 GB/s batched gather on the identical [R,V] row pattern
(tools/dma_gather_probe.py 40960 2048 16 1408). End-to-end colonnade
200px spp4: 4.0 s vs 1.15 s — the kernel call also forfeits XLA's
select/sweep fusion. Conclusion recorded in BASELINE.md: chunk-row
gather traffic is already near the access-pattern's speed limit; the
win must come from moving FEWER BYTES (wavefront lane compaction,
quantized candidate rows), not from moving the same bytes differently.

Semantics are EXACTLY ops/perray._planar_sweep / _sphere_sweep (same
masks, sentinels, and first-index tie-breaks); the wrapper packs the
best-hit state as one [R, 8] f32 matrix (t, nx, ny, nz, u, v, mat, pid —
mat/pid exact in f32 below 2^24). The early-exit `while any ray can
improve` of the XLA form becomes a per-slot compute skip; the row DMAs
for all V slots are issued regardless (same bytes as the XLA gather —
the win is bandwidth and overlap, not traffic).

Forward-only; the per-ray accel's custom VJP replays the winning
primitive in O(R) (ops/replay.py). CPU tests run interpret=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf
BIG = 1e30
RB = 256  # rays per program: 2 x [RB, ROWF] row buffers ~2.9 MB VMEM


def _issue(ids_smem, table_ref, buf, sems, par, s):
    """Start the RB row DMAs for visit slot ``s`` into buffer ``par``."""

    def one(r, _):
        idx = ids_smem[r, s]
        pltpu.make_async_copy(table_ref.at[idx], buf.at[par, r],
                              sems.at[par]).start()
        return 0

    jax.lax.fori_loop(0, RB, one, 0)


def _wait(ids_smem, table_ref, buf, sems, par, s):
    def one(r, _):
        idx = ids_smem[r, s]
        pltpu.make_async_copy(table_ref.at[idx], buf.at[par, r],
                              sems.at[par]).wait()
        return 0

    jax.lax.fori_loop(0, RB, one, 0)


def _first_min_idx(ts, t_c, C):
    """First lane index achieving the min — jnp.argmin's tie-break without
    an argmin (matches ops/perray's jnp.argmin semantics)."""
    col = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 1)
    return jnp.min(jnp.where(ts == t_c, col, C), axis=1, keepdims=True)


def _sel(comp, idx):
    """comp[r, idx[r]] as [RB,1] via a masked lane reduction."""
    col = jax.lax.broadcasted_iota(jnp.int32, comp.shape, 1)
    return jnp.sum(jnp.where(col == idx, comp, 0.0), axis=1, keepdims=True)


def _planar_slot(rays_ref, row, C, tmin, t_best, triangle):
    """[RB, C] candidate ts + attribute planes for one gathered row —
    ops/perray._planar_row_ts on the VMEM row buffer (same guards).
    ``row`` is [RB, F, C]: component f of ray r's gathered chunk at
    row[r, f, :] (leading dims untiled — see sweep() layout note)."""
    c = lambda i: row[:, i, :]
    cx, cy, cz = c(0), c(1), c(2)
    eux, euy, euz = c(3), c(4), c(5)
    evx, evy, evz = c(6), c(7), c(8)

    nx = euy * evz - euz * evy
    ny = euz * evx - eux * evz
    nz = eux * evy - euy * evx
    nn = nx * nx + ny * ny + nz * nz
    inv_len = jax.lax.rsqrt(jnp.maximum(nn, 1e-30))
    unx, uny, unz = nx * inv_len, ny * inv_len, nz * inv_len
    d_plane = unx * cx + uny * cy + unz * cz
    inv_nn = 1.0 / jnp.maximum(nn, 1e-20)
    wx, wy, wz = nx * inv_nn, ny * inv_nn, nz * inv_nn
    ewx = evy * wz - evz * wy
    ewy = evz * wx - evx * wz
    ewz = evx * wy - evy * wx
    wex = wy * euz - wz * euy
    wey = wz * eux - wx * euz
    wez = wx * euy - wy * eux

    o = lambda a: rays_ref[:, a:a + 1]
    d = lambda a: rays_ref[:, 3 + a:4 + a]
    o_n = unx * o(0) + uny * o(1) + unz * o(2)
    d_n = unx * d(0) + uny * d(1) + unz * d(2)
    ok0 = jnp.abs(d_n) > 1e-20
    t = jnp.where(ok0, (d_plane - o_n) / jnp.where(ok0, d_n, 1.0), BIG)

    dot_o = lambda x, y, z: x * o(0) + y * o(1) + z * o(2)
    dot_d = lambda x, y, z: x * d(0) + y * d(1) + z * d(2)
    a = jnp.clip(dot_o(ewx, ewy, ewz) + t * dot_d(ewx, ewy, ewz)
                 - (ewx * cx + ewy * cy + ewz * cz), -BIG, BIG)
    b = jnp.clip(dot_o(wex, wey, wez) + t * dot_d(wex, wey, wez)
                 - (wex * cx + wey * cy + wez * cz), -BIG, BIG)
    if triangle:
        interior = (a >= 0.0) & (b >= 0.0) & (a + b <= 1.0)
    else:
        interior = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    # inactive lanes carry eu=ev=0 -> d_n == 0 -> ok0 false (the 9-comp
    # table bakes the active flag in, ops/perray._planar_table)
    ok = ok0 & (t >= tmin) & (t <= t_best) & interior
    return jnp.where(ok, t, INF), a, b, (unx, uny, unz)


def _sphere_slot(rays_ref, row, C, tmin, t_best):
    """[RB, C] sphere ts per gathered row — ops/perray._sphere_row_ts.
    rays_ref col 6 carries the ray time."""
    c = lambda i: row[:, i, :]
    c0x, c0y, c0z = c(0), c(1), c(2)
    c1x, c1y, c1z = c(3), c(4), c(5)
    rad = c(6)
    tt = rays_ref[:, 6:7]
    ctx = c0x + tt * (c1x - c0x)
    cty = c0y + tt * (c1y - c0y)
    ctz = c0z + tt * (c1z - c0z)

    o = lambda a: rays_ref[:, a:a + 1]
    d = lambda a: rays_ref[:, 3 + a:4 + a]
    ocx = o(0) - ctx
    ocy = o(1) - cty
    ocz = o(2) - ctz
    a_q = d(0) * d(0) + d(1) * d(1) + d(2) * d(2)
    b_q = 2.0 * (d(0) * ocx + d(1) * ocy + d(2) * ocz)
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    has = disc > 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))
    t0 = (-b_q - sq) / (2.0 * a_q)
    t1 = (-b_q + sq) / (2.0 * a_q)
    in0 = (t0 >= tmin) & (t0 <= t_best)
    in1 = (t1 >= tmin) & (t1 <= t_best)
    t = jnp.where(in0, t0, jnp.where(in1, t1, INF))
    # inactive lanes carry rad=0 -> disc <= 0 (Cauchy-Schwarz) -> no hit
    return jnp.where(has, t, INF), (ctx, cty, ctz), rad


def _kernel(rays_ref, ids_vref, nears_ref, best_ref, table_ref, out_ref,
            ids_smem, buf, done_sem, sems, *, V: int, C: int, tmin: float,
            triangle: bool, sphere: bool):
    cp = pltpu.make_async_copy(ids_vref, ids_smem, done_sem)
    cp.start()
    cp.wait()

    t_b = best_ref[:, 0:1]
    nx_b = best_ref[:, 1:2]
    ny_b = best_ref[:, 2:3]
    nz_b = best_ref[:, 3:4]
    u_b = best_ref[:, 4:5]
    v_b = best_ref[:, 5:6]
    m_b = best_ref[:, 6:7]
    p_b = best_ref[:, 7:8]

    _issue(ids_smem, table_ref, buf, sems, 0, 0)
    for s in range(V):
        par = s % 2
        if s + 1 < V:
            _issue(ids_smem, table_ref, buf, sems, 1 - par, s + 1)
        _wait(ids_smem, table_ref, buf, sems, par, s)

        row = buf[par]
        ns = nears_ref[:, s:s + 1]
        if sphere:
            ts, (ctx, cty, ctz), rad = _sphere_slot(
                rays_ref, row, C, tmin, t_b)
        else:
            ts, a, b, (unx, uny, unz) = _planar_slot(
                rays_ref, row, C, tmin, t_b, triangle)
        t_c = jnp.min(ts, axis=1, keepdims=True)
        idx = _first_min_idx(ts, t_c, C)
        # front-to-back validity: a slot whose entry t can't beat the
        # running best can't improve (mirrors the XLA while cond per-lane)
        better = (t_c < t_b) & (ns < t_b)
        idf = idx.astype(jnp.float32)
        pid_c = ids_vref[:, s:s + 1].astype(jnp.float32) * C + idf
        if sphere:
            # sphere best layout: t, cx, cy, cz, rad, -, mat, pid
            nx_c, ny_c, nz_c = _sel(ctx, idx), _sel(cty, idx), _sel(ctz, idx)
            u_c = jnp.maximum(_sel(rad, idx), 1e-20)
            v_c = v_b
        else:
            nx_c, ny_c, nz_c = _sel(unx, idx), _sel(uny, idx), _sel(unz, idx)
            u_c = _sel(a, idx)
            v_c = _sel(b, idx)
        # mat column rides untouched: recovered per winner after the
        # phase loop (ops/perray._recover_mat)
        t_b = jnp.where(better, t_c, t_b)
        nx_b = jnp.where(better, nx_c, nx_b)
        ny_b = jnp.where(better, ny_c, ny_b)
        nz_b = jnp.where(better, nz_c, nz_b)
        u_b = jnp.where(better, u_c, u_b)
        v_b = jnp.where(better, v_c, v_b)
        p_b = jnp.where(better, pid_c, p_b)

    out_ref[:, 0:1] = t_b
    out_ref[:, 1:2] = nx_b
    out_ref[:, 2:3] = ny_b
    out_ref[:, 3:4] = nz_b
    out_ref[:, 4:5] = u_b
    out_ref[:, 5:6] = v_b
    out_ref[:, 6:7] = m_b
    out_ref[:, 7:8] = p_b


@functools.partial(
    jax.jit,
    static_argnames=("V", "C", "tmin", "triangle", "sphere", "interpret"))
def sweep(rays, ids, nears, best, table, V: int, C: int, tmin: float,
          triangle: bool, sphere: bool, interpret: bool = False):
    """One V-slot sweep: rays [R,8] (o, d, time, pad), ids [R,V] int32
    (clipped), nears [R,V] ascending entry ts, best [R,8] packed state,
    table [K, F, C] fused component rows (stays in HBM; component f of
    chunk k at table[k, f, :] — 3D so a row DMA slices only UNTILED
    leading dims: Mosaic requires tiled-dim slices be 8-sublane aligned,
    and a [1, F*C] slice of a 2D buffer is not). R must be a multiple of
    RB. Returns the updated [R,8] best."""
    R = rays.shape[0]
    assert R % RB == 0, (R, RB)
    F = table.shape[1]
    assert table.shape[2] == C, (table.shape, C)
    if jax.default_backend() != "tpu":
        interpret = True
    kern = functools.partial(_kernel, V=V, C=C, tmin=tmin,
                             triangle=triangle, sphere=sphere)
    grid = (R // RB,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RB, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((RB, V), jnp.int32),
            pltpu.VMEM((2, RB, F, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, ids, nears, best, table)


# -------------------------------------------------------------- wrappers
def pack_rays(org, dirs, time=None):
    R = org.shape[0]
    t = (jnp.zeros((R, 1), org.dtype) if time is None
         else jnp.asarray(time, org.dtype)[:, None])
    return jnp.concatenate([org, dirs, t, jnp.zeros((R, 1), org.dtype)],
                           axis=1)


def pad_to_block(x, fill=0.0):
    R = x.shape[0]
    Rp = -(-R // RB) * RB
    if Rp == R:
        return x, R
    pad = jnp.full((Rp - R,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0), R


def pack_best_planar(best):
    """ops/perray planar best tuple -> [R,8] (t nx ny nz u v mat pid)."""
    t, n, u, v, m, p = best
    return jnp.stack([t, n[:, 0], n[:, 1], n[:, 2], u, v,
                      m.astype(t.dtype), p.astype(t.dtype)], axis=1)


def unpack_best_planar(pk):
    return (pk[:, 0], pk[:, 1:4], pk[:, 4], pk[:, 5],
            jnp.round(pk[:, 6]).astype(jnp.int32),
            jnp.round(pk[:, 7]).astype(jnp.int32))


def pack_best_sphere(best):
    """sphere best tuple (t, center [R,3], rad, mat, pid) -> [R,8]."""
    t, ctr, rad, m, p = best
    z = jnp.zeros_like(t)
    return jnp.stack([t, ctr[:, 0], ctr[:, 1], ctr[:, 2], rad, z,
                      m.astype(t.dtype), p.astype(t.dtype)], axis=1)


def unpack_best_sphere(pk):
    return (pk[:, 0], pk[:, 1:4], pk[:, 4],
            jnp.round(pk[:, 6]).astype(jnp.int32),
            jnp.round(pk[:, 7]).astype(jnp.int32))
