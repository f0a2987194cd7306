"""Probe per-tile chunk-cull quality for the packet traversal.

For a catalog scene, reports — per bounce and per tile size — the
distribution (mean / p50 / p90 / max) of the number of chunks each ray
tile would visit (chunks whose AABB passes the any-ray slab cull, capped
by the scene-AABB exit cap), with and without the coherence sort.

The lockstep packet loop's trip count is the MAX of this distribution and
its useful work is the MEAN — the gap is wasted lockstep compute, which
is what this tool exists to quantify (see ops/packet.py).

Run on the chip:  python tools/packet_stats.py [scene] [width] [bounces]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.models import catalog, camera as cam_mod
from cpu_ray_tracing_implementation_tpu.models import integrator as integ
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import materials as mat_ops
from cpu_ray_tracing_implementation_tpu.ops import packet as pkt
from cpu_ray_tracing_implementation_tpu.ops import raysort

scene_name = sys.argv[1] if len(sys.argv) > 1 else "sponza"
width = int(sys.argv[2]) if len(sys.argv) > 2 else 200
n_bounce = int(sys.argv[3]) if len(sys.argv) > 3 else 3

scene, cam = getattr(catalog, scene_name)(width=width, spp=4)
chunks = scene.tri_chunks if scene.tri_chunks is not None else \
    (scene.quad_chunks or scene.sphere_chunks)
K = chunks.lo.shape[0]
n_pix = cam.width * cam.height
print(f"{scene_name}: {K} chunks, {n_pix} rays/sample")

key = jax.random.PRNGKey(0)
pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
k_cam, k_path = jax.random.split(key)
u_cam = integ._per_ray_uniforms(k_cam, pixel_ids, cam_mod.N_CAM_SLOTS)
org, dirs, time = cam_mod.generate_rays(cam, pixel_ids, u_cam)
nslot = mat_ops.NSLOT + scene.n_volumes
throughput = jnp.ones((n_pix, 3))
radiance = jnp.zeros((n_pix, 3))
alive = jnp.ones((n_pix,), bool)


@functools.partial(jax.jit, static_argnames=("tile",))
def visit_counts(org, dirs, alive, tile):
    """[G] chunks passing the per-tile cull (sorted lanes, capped)."""
    cap = isect._packet_cap(scene, org, dirs, alive, jnp.inf, 1e-3)
    lo = jnp.asarray(scene.world_lo, jnp.float32)
    hi = jnp.asarray(scene.world_hi, jnp.float32)
    keys = raysort.coherence_keys(org, dirs, lo, hi)
    keys = jnp.where(alive, keys, jnp.int32(0x40000000))
    (s_org, s_dirs, s_cap), _ = raysort.sort_rays(keys, [org, dirs, cap])
    org_t, dirs_t, cap_t = pkt._pad_tiles([s_org, s_dirs, s_cap],
                                          n_pix, tile)
    hit_any, _ = jax.vmap(
        lambda o, d, tx: pkt._chunk_hits(o, d, chunks.lo, chunks.hi,
                                         1e-3, tx))(org_t, dirs_t, cap_t)
    return jnp.sum(hit_any, axis=-1)


for b in range(n_bounce):
    n_alive = int(jnp.sum(alive))
    line = f"bounce {b} (alive {n_alive:6d}): "
    for tile in (256, 512, 2048):
        v = np.asarray(visit_counts(org, dirs, alive, tile))
        line += (f"T={tile}: mean {v.mean():6.1f} p50 {np.percentile(v,50):5.0f} "
                 f"p90 {np.percentile(v,90):5.0f} max {v.max():5.0f} | ")
    print(line, flush=True)
    u = integ._per_ray_uniforms(jax.random.fold_in(k_path, b), pixel_ids,
                                nslot)
    org, dirs, time, throughput, radiance, alive = integ._shade_step(
        scene, org, dirs, time, throughput, radiance, alive, u)

# ------------------------------------------------------------------ per-ray
# Per-ray ceilings: how many chunks does each RAY cross (culled), and how
# many lie in front of its closest hit (what perfect per-ray front-to-back
# traversal would visit)? Gap vs the per-tile numbers above = what finer
# granularity could win.
print("\nper-ray (fresh camera rays):")
org, dirs, time = cam_mod.generate_rays(cam, pixel_ids, u_cam)
throughput = jnp.ones((n_pix, 3)); radiance = jnp.zeros((n_pix, 3))
alive = jnp.ones((n_pix,), bool)
k_pr = jax.random.split(key)[1]


@jax.jit
def per_ray_counts(org, dirs, time, alive):
    cap = isect._packet_cap(scene, org, dirs, alive, jnp.inf, 1e-3)
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-20, dirs, 1e-20)
    t0 = (chunks.lo[None] - org[:, None]) * inv[:, None]    # [R,K,3]
    t1 = (chunks.hi[None] - org[:, None]) * inv[:, None]
    near = jnp.max(jnp.minimum(t0, t1), -1)
    far = jnp.min(jnp.maximum(t0, t1), -1)
    ok = (near <= far) & (far >= 1e-3) & (near <= cap[:, None])
    hit = isect.intersect_brute(scene, org, dirs, time, 1e-3,
                                jnp.zeros((org.shape[0], scene.n_volumes)))
    t_hit = jnp.where(hit.valid, hit.t, cap)
    infront = ok & (near <= t_hit[:, None])
    return jnp.sum(ok, -1), jnp.sum(infront, -1)


S = 8192  # subsample rays to keep [S,K] small
for b in range(n_bounce):
    sel = jax.random.permutation(jax.random.fold_in(k_pr, b),
                                 n_pix)[:S]
    c_cull, c_front = per_ray_counts(org[sel], dirs[sel], time[sel],
                                     alive[sel])
    c_cull, c_front = np.asarray(c_cull), np.asarray(c_front)
    al = np.asarray(alive[sel])
    c_cull, c_front = c_cull[al], c_front[al]
    print(f"bounce {b}: culled mean {c_cull.mean():6.1f} p90 "
          f"{np.percentile(c_cull,90):5.0f} max {c_cull.max():5.0f} | "
          f"to-first-hit mean {c_front.mean():6.1f} p90 "
          f"{np.percentile(c_front,90):5.0f} max {c_front.max():5.0f}",
          flush=True)
    u = integ._per_ray_uniforms(jax.random.fold_in(k_path, b), pixel_ids,
                                nslot)
    org, dirs, time, throughput, radiance, alive = integ._shade_step(
        scene, org, dirs, time, throughput, radiance, alive, u)
