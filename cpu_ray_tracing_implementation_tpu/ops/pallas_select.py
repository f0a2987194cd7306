"""Pallas TPU kernel: fused per-ray chunk cull + top-V selection.

The per-ray accelerator (ops/perray.py) spends most of its non-sweep time
materializing the [R,K] near matrix in HBM and running V (min, argmin,
mask) rounds over it from HBM (~55 ms/bounce at V=16 on the colonnade).
This kernel fuses both: each program takes a block of RB rays, computes
the [RB,K] slab-entry matrix against all K chunk AABBs in VMEM (the AABB
pack is 8xK — kilobytes), runs the V selection rounds entirely in VMEM,
and writes only the [RB,V] (ids, nears) lists plus the min of the
remainder. Nothing of size [R,K] ever touches HBM.

Phase semantics for the exactness loop: selection is ascending in the
lexicographic key (near, chunk id) — ties broken toward the lower id,
matching jnp.argmin's first-index tie-break in the XLA path. A phase
excludes everything at or below its predecessor's last selected key
(thr, last_id), so consecutive phases partition the full ordered visit
list without the [R,K] matrix ever being carried between them.

Forward-only (the per-ray accel wraps everything in a custom VJP whose
backward replays the forward's winning primitive in O(R) —
ops/replay.py, since b343828). CPU tests run interpret=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf
BIG = 1e30


def _ray_block(K: int) -> int:
    """Rays per program: bounded so ~3 [RB,K] f32 intermediates fit VMEM."""
    rb = (3 << 20) // max(K, 1)
    return max(8, min(512, rb // 8 * 8))


def _id_bits(K: int) -> int:
    """Low key bits holding the chunk id (packed mode)."""
    return max(11, (K - 1).bit_length())


def _kernel(rays_ref, boxes_ref, excl_ref, ids_ref, nears_ref, rest_ref,
            *, V: int, K: int, K_real: int, tmin: float, packed: bool):
    RB = rays_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (RB, K), 1)

    near = jnp.full((RB, K), -BIG, jnp.float32)
    far = jnp.full((RB, K), BIG, jnp.float32)
    for a in range(3):
        o = rays_ref[:, a:a + 1]
        d = rays_ref[:, 3 + a:4 + a]
        inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
        t0 = (boxes_ref[a:a + 1, :] - o) * inv
        t1 = (boxes_ref[3 + a:4 + a, :] - o) * inv
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    cap = rays_ref[:, 6:7]
    # col < K_real: lane-padding columns must never cull in (a min/max slab
    # test sees an "inverted" box as an infinite one)
    ok = (near <= far) & (far >= tmin) & (near <= cap) & (col < K_real)
    nearm = jnp.where(ok, jnp.maximum(near, tmin), INF)

    thr = excl_ref[:, 0:1]
    lid = excl_ref[:, 1:2].astype(jnp.int32)

    if packed:
        # ---- packed-key selection: one int32 key = (near bits | id) ----
        # nearm >= tmin > 0, so its f32 bit pattern orders as a POSITIVE
        # int32; stealing the low IDB mantissa bits for the chunk id makes
        # (coarsened near, id) one total order — each selection round is
        # min + mask (3 vector ops/element) instead of the exact path's 6,
        # and the phase exclusion is a single compare. The near the caller
        # gets back is rounded DOWN by the stolen bits (rel 2^-(23-IDB)),
        # which is CONSERVATIVE everywhere it is used: the sweep's
        # can-this-slot-improve masks and the phase loop's rest-vs-best
        # test only ever do MORE work for a smaller near, never less, and
        # the final (t, pid) is decided by exact geometry in the sweep —
        # the phase-loop result is identical to the exact mode's UP TO
        # EXACT-t TIES (tests/test_pallas_select.py): chunks whose nears
        # coarsen equal are visited in id order rather than exact-near
        # order, so two primitives in DIFFERENT chunks with exactly equal
        # hit t (shared edges/vertices in structured scenes) can resolve
        # to a different — still deterministic — winning pid/normal/mat.
        IDB = _id_bits(K)
        HMASK = jnp.int32(-(1 << IDB))           # high (near) bits
        MASKV = jnp.int32(0x7FFFFFFF)            # > every real key
        key = (jax.lax.bitcast_convert_type(nearm, jnp.int32) & HMASK) | col

        # previous phase's last selected key; thr < 0 = phase 1 (exclude
        # nothing: every real key is > 0 because near >= tmin > 0); NaN
        # thr = the ray's list was exhausted in an earlier phase (its
        # last slots were MASKV selections) -> exclude EVERYTHING, or the
        # phase loop would re-select visited chunks forever
        thr_bits = (jax.lax.bitcast_convert_type(
            jnp.maximum(thr, 0.0), jnp.int32) & HMASK) | jnp.maximum(lid, 0)
        excl_key = jnp.where(thr >= 0.0, thr_bits,
                             jnp.where(jnp.isnan(thr), MASKV, jnp.int32(0)))
        key = jnp.where(key <= excl_key, MASKV, key)

        for v in range(V):
            m = jnp.min(key, axis=1, keepdims=True)             # [RB,1]
            ids_ref[:, v:v + 1] = m & ~HMASK
            nears_ref[:, v:v + 1] = jax.lax.bitcast_convert_type(
                m & HMASK, jnp.float32)
            key = jnp.where(key == m, MASKV, key)

        rest_ref[:, 0:1] = jax.lax.bitcast_convert_type(
            jnp.min(key, axis=1, keepdims=True) & HMASK, jnp.float32)
        return

    # ---- exact (near, id) lexicographic selection ----
    # exclude keys at or below the previous phase's last selected (thr, id)
    visited = (nearm < thr) | ((nearm == thr) & (col <= lid))
    nearm = jnp.where(visited, INF, nearm)

    # static unroll: Mosaic cannot prove a dynamic lane offset store is
    # tile-aligned (pl.ds(v, 1) on the minor dim fails to compile), and V
    # is small and static anyway
    for v in range(V):
        m = jnp.min(nearm, axis=1, keepdims=True)               # [RB,1]
        idx = jnp.min(jnp.where(nearm == m, col, K), axis=1,
                      keepdims=True)                            # first min
        ids_ref[:, v:v + 1] = idx
        nears_ref[:, v:v + 1] = m
        nearm = jnp.where(col == idx, INF, nearm)

    rest_ref[:, 0:1] = jnp.min(nearm, axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("V", "K_real", "tmin", "interpret",
                                    "packed"))
def cull_select(rays, boxes, excl, V: int, K_real: int, tmin: float,
                interpret: bool = False, packed: bool = True):
    """(ids [R,V] int32, nears [R,V] f32 ascending, rest [R] f32).

    ``rays``: [R, 8] (ox oy oz dx dy dz cap pad), R a multiple of the ray
    block; ``boxes``: [8, K] (lox loy loz hix hiy hiz **): K a multiple of
    128, padded chunks with an inverted box (+BIG/-BIG); ``excl``: [R, 2]
    (near threshold f32, last id as f32) — pass (-BIG, -1) for phase 1.

    ``packed`` (default): packed-key selection rounds — nears come back
    rounded DOWN by the id bits (rel 2^-(23-IDB), conservative; NaN
    instead of +inf for exhausted slots), ids/phase partition unchanged.
    ``packed=False`` is the exact (near, id) reference path.

    PRECONDITION for packed mode: ``tmin > 0``. The key order relies on
    every real near's f32 bit pattern being a positive int32; with
    tmin == 0 a ray starting inside chunk 0's AABB gets near == 0, whose
    coarsened key (0) would be swallowed by the phase-1 exclusion
    (key <= excl_key == 0) and real geometry skipped (ADVICE r04).
    Callers always pass the positive T_MIN literal; a non-positive tmin
    falls back to the exact path, which has no such assumption.
    """
    if tmin <= 0.0:
        packed = False
    R = rays.shape[0]
    K = boxes.shape[1]
    RB = _ray_block(K)
    assert R % RB == 0, (R, RB)
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the interpreter
    grid = (R // RB,)
    kern = functools.partial(_kernel, V=V, K=K, K_real=K_real, tmin=tmin,
                             packed=packed)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RB, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, V), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, V), jnp.int32),
            jax.ShapeDtypeStruct((R, V), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rays, boxes, excl)


def pack_rays(org, dirs, cap):
    """[R, 8] ray pack (pad to the block multiple with pad_rays)."""
    R = org.shape[0]
    return jnp.concatenate(
        [org, dirs, cap[:, None], jnp.zeros((R, 1), org.dtype)], axis=1)


def pad_rays(pack, K: int):
    R = pack.shape[0]
    RB = _ray_block(K)
    Rp = -(-R // RB) * RB
    if Rp != R:
        fill = jnp.zeros((Rp - R, pack.shape[1]), pack.dtype)
        pack = jnp.concatenate([pack, fill], axis=0)
    return pack, Rp


def pack_boxes(lo, hi):
    """[8, Kpad] AABB pack, chunks padded to a lane multiple with inverted
    boxes so they never cull in."""
    K = lo.shape[0]
    Kp = -(-K // 128) * 128
    pack = jnp.full((8, Kp), BIG, jnp.float32)
    pack = pack.at[0:3, :K].set(lo.T)
    pack = pack.at[3:6, :K].set(hi.T)
    pack = pack.at[3:6, K:].set(-BIG)
    return pack
