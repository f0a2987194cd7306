"""Decompose the SHADE stage of the headline forward pass (VERDICT r04
weak 1: shade is ~70% of forward and had never been ablated the way
intersect was).

Same slope methodology as tools/profile_bench.py (two spp points cancel the
tunnel's fixed dispatch term; best-of-3 rejects hiccups), applied to a
CUMULATIVE ladder through _shade_step's internals on the bench workload
(Cornell 512x512 d8):

  base   raygen + path RNG + intersect x depth      (profile_bench stage 3)
  +emit  + emitted() (material-type gather + emission texture eval)
  +texR  + albedo texture eval (mat tex row gather + eval_texture)
  +lobe  + _sample_lobes (all material families' candidate dirs + weights)
  +mis   + light_sample + light_pdf (the MIS mixture machinery)
  full   render_sample (adds: estimator combine, background, RR/masks)

Each consecutive delta is that sub-stage's real per-sample cost. Run on
the chip:  python tools/shade_profile.py [spp_lo] [spp_hi]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.models import (camera as cam_mod,
                                                       catalog, integrator)
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import materials as mat_ops
from cpu_ray_tracing_implementation_tpu.ops import tables as tbl
from cpu_ray_tracing_implementation_tpu.ops.textures import eval_texture

spp_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spp_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 128
scene, cam = catalog.cornell_box(width=512, spp=spp_hi, max_depth=8)
key = jax.random.key(0)
n_pix = cam.width * cam.height
pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
nslot = mat_ops.NSLOT + scene.n_volumes
depth = cam.max_depth


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        ts.append(time.time() - t0)
    return min(ts)


def spp_scan(per_sample, spp):
    def run(k):
        def one(acc, s):
            return acc + per_sample(jax.random.fold_in(k, s)), None
        acc, _ = jax.lax.scan(one, jnp.zeros((n_pix, 3)), jnp.arange(spp))
        return acc
    return jax.jit(run)


def slope(per_sample):
    t_lo = timed(spp_scan(per_sample, spp_lo), key)
    t_hi = timed(spp_scan(per_sample, spp_hi), key)
    return max((t_hi - t_lo) / (spp_hi - spp_lo), 0.0)


def bounce_loop(body):
    """raygen + RNG + per-bounce body(hit, u, org, dirs, acc) -> extra."""
    def per_sample(k):
        k_cam, k_path = jax.random.split(k)
        u_cam = integrator._per_ray_uniforms(k_cam, pixel_ids,
                                            cam_mod.N_CAM_SLOTS)
        org, dirs, t = cam_mod.generate_rays(cam, pixel_ids, u_cam)

        def bounce(carry, b):
            org, dirs, acc = carry
            u = integrator._per_ray_uniforms(jax.random.fold_in(k_path, b),
                                            pixel_ids, nslot)
            hit = isect.intersect_brute(scene, org, dirs, t,
                                        integrator.T_MIN,
                                        u[:, mat_ops.SLOT_VOLUME0:])
            acc = acc + body(hit, u, org, dirs)
            org = jnp.where(hit.valid[:, None], hit.p, org)
            return (org, dirs, acc), None

        (_, _, acc), _ = jax.lax.scan(
            bounce, (org, dirs, jnp.zeros((n_pix, 3))), jnp.arange(depth))
        return acc
    return per_sample


mats = scene.materials
n_m = mats.mtype.shape[0]


def body_none(hit, u, org, dirs):
    return hit.p * 0.0


def body_emit(hit, u, org, dirs):
    return mat_ops.emitted(scene, hit)


def body_tex(hit, u, org, dirs):
    e = mat_ops.emitted(scene, hit)
    oh = tbl.onehot(hit.mat, n_m) if n_m <= tbl.MAX_ONEHOT else None
    atten = eval_texture(scene, tbl.take_rows(mats.tex, hit.mat, oh),
                         hit.u, hit.v, hit.p)
    return e + atten


def body_lobes(hit, u, org, dirs):
    e = mat_ops.emitted(scene, hit)
    (mt, atten, det_dir, det_w, is_det, is_iso, is_rand, mat_sample,
     score_w) = mat_ops._sample_lobes(scene, hit, dirs, u)
    return e + atten + det_dir * det_w + mat_sample * score_w[:, None]


def body_mis(hit, u, org, dirs):
    out = body_lobes(hit, u, org, dirs)
    ldir = mat_ops.light_sample(scene, hit.p, u[:, mat_ops.SLOT_LIGHT_PICK],
                                u[:, mat_ops.SLOT_LIGHT_U],
                                u[:, mat_ops.SLOT_LIGHT_V])
    lp = mat_ops.light_pdf(scene, hit.p, ldir)
    return out + ldir * lp[:, None]


def full(k):
    return integrator.render_sample(scene, cam, k, pixel_ids)


rows = []
for name, fn in [("base (raygen+rng+isect)", bounce_loop(body_none)),
                 (" + emitted", bounce_loop(body_emit)),
                 (" + albedo texture", bounce_loop(body_tex)),
                 (" + material lobes", bounce_loop(body_lobes)),
                 (" + light MIS mixture", bounce_loop(body_mis)),
                 ("full forward", full)]:
    per = slope(fn)
    rows.append((name, per))
    print(f"{name:26s}: {per*1e3:7.3f} ms/sample", flush=True)

t_full = rows[-1][1]
print("\nshade sub-stage deltas (share of full forward, per sample):")
prev = None
for name, per in rows:
    if prev is not None:
        d = per - prev
        print(f"  {name:26s} {d*1e3:7.3f} ms  {d/t_full*100:5.1f}%",
              flush=True)
    prev = per
base = rows[0][1]
shade_total = t_full - base
print(f"\n  base (non-shade)           {base*1e3:7.3f} ms  "
      f"{base/t_full*100:5.1f}%")
print(f"  shade total                {shade_total*1e3:7.3f} ms  "
      f"{shade_total/t_full*100:5.1f}%", flush=True)
