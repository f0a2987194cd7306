"""Profile the headline fwd+bwd workload: stage ablation + analytic roofline.

XLA's compiled cost_analysis() counts a `scan`/`while` body ONCE, so its
flops are useless for this loop-shaped workload (measured: 1.2e9 "flops"
for a ~1.7e11-flop render). The tensorboard xplane parsers are broken in
this environment. So this tool derives the cost centers the robust way:

 1. SLOPE-based stage-ablation — time jitted subsets of the per-bounce
    pipeline (raygen / RNG / intersect / full fwd / fwd+bwd), each at TWO
    spp values, and take (dt_hi - dt_lo) / (spp_hi - spp_lo) as the real
    per-sample cost. The axon tunnel adds a FIXED ~35-90 ms per dispatch
    (latency + result fetch; measured: a 32-iter and a 128-iter null scan
    both cost ~90 ms) which a single-shot timing attributes to whatever
    stage ran first — the slope cancels it. The fixed overhead is
    reported separately.
 2. an analytic per-segment FLOP model (counted from the ops the dense
    intersector + shading actually execute) to place the achieved rate
    against the VPU roofline — this workload is elementwise-dominated, so
    the VPU f32 rate (not the MXU bf16 peak) is the honest speed of light.

Run on the chip:  python tools/profile_bench.py [spp_lo] [spp_hi]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.models import (camera as cam_mod,
                                                       catalog, diff,
                                                       integrator)
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import materials as mat_ops

spp_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spp_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 128
scene, cam = catalog.cornell_box(width=512, spp=spp_hi, max_depth=8)
target = jnp.zeros((cam.height, cam.width, 3))
key = jax.random.key(0)
n_pix = cam.width * cam.height
pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
nslot = mat_ops.NSLOT + scene.n_volumes
depth = cam.max_depth


def timed(fn, *args, reps=3):
    """Best-of-``reps`` steady-state timing: tunnel hiccups only ever ADD
    time, so min over repeats rejects them (BASELINE.md methodology)."""
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
    """Sum a per-sample fn over spp samples, like accumulate_samples."""
    def run(k):
        def one(acc, s):
            return acc + per_sample(jax.random.fold_in(k, s)), None
        acc, _ = jax.lax.scan(one, jnp.zeros((n_pix, 3)), jnp.arange(spp))
        return acc
    return jax.jit(run)


def slope(make_fn):
    """(per-sample seconds, fixed dispatch seconds) via two-point fit."""
    t_lo = timed(make_fn(spp_lo), key)
    t_hi = timed(make_fn(spp_hi), key)
    per = max((t_hi - t_lo) / (spp_hi - spp_lo), 0.0)
    fixed = max(t_lo - per * spp_lo, 0.0)
    return per, fixed


# -- stages ----------------------------------------------------------------
def stage_raygen(k):
    k_cam, _ = jax.random.split(k)
    u_cam = integrator._per_ray_uniforms(k_cam, pixel_ids, cam_mod.N_CAM_SLOTS)
    org, dirs, t = cam_mod.generate_rays(cam, pixel_ids, u_cam)
    return org + dirs + t[:, None]


def stage_rng(k):
    _, k_path = jax.random.split(k)
    def bounce(acc, b):
        u = integrator._per_ray_uniforms(jax.random.fold_in(k_path, b),
                                         pixel_ids, nslot)
        return acc + jnp.sum(u, axis=1, keepdims=True) * jnp.ones((1, 3)), None
    acc, _ = jax.lax.scan(bounce, jnp.zeros((n_pix, 3)), jnp.arange(depth))
    return acc


def stage_intersect(k):
    """raygen + RNG + depth x intersect (no shading: hit point feeds the
    next bounce with the same direction)."""
    k_cam, k_path = jax.random.split(k)
    u_cam = integrator._per_ray_uniforms(k_cam, pixel_ids, cam_mod.N_CAM_SLOTS)
    org, dirs, t = cam_mod.generate_rays(cam, pixel_ids, u_cam)
    def bounce(carry, b):
        org, dirs = carry
        u = integrator._per_ray_uniforms(jax.random.fold_in(k_path, b),
                                         pixel_ids, nslot)
        hit = isect.intersect_brute(scene, org, dirs, t, integrator.T_MIN,
                                    u[:, mat_ops.SLOT_VOLUME0:])
        org = jnp.where(hit.valid[:, None], hit.p, org)
        return (org, dirs), None
    (org, _), _ = jax.lax.scan(bounce, (org, dirs), jnp.arange(depth))
    return org


def stage_fwd(k):
    return integrator.render_sample(scene, cam, k, pixel_ids)


rows = []
for name, per_sample in [("raygen+film", stage_raygen),
                         (" + path RNG", stage_rng),
                         (" + intersect x depth", stage_intersect),
                         (" + shade (full fwd)", stage_fwd)]:
    per, fixed = slope(lambda spp, f=per_sample: spp_scan(f, spp))
    rows.append((name, per))
    mrays = n_pix / per / 1e6 if per > 0 else float("inf")
    print(f"{name:22s}: {per*1e3:7.3f} ms/sample  ({mrays:6.1f} M "
          f"rays/s)  [+{fixed*1e3:.0f} ms fixed dispatch]", flush=True)

per_fb, fixed_fb = slope(
    lambda spp: (lambda k: diff.loss_and_grads(scene, cam, k, target, spp=spp)))
t_fwd = rows[-1][1]
rows.append(("fwd+bwd", per_fb))
print(f"{'fwd+bwd':22s}: {per_fb*1e3:7.3f} ms/sample  "
      f"({n_pix/per_fb/1e6:6.1f} M rays/s)  bwd/fwd = "
      f"{(per_fb - t_fwd)/t_fwd:.2f}x  [+{fixed_fb*1e3:.0f} ms fixed]",
      flush=True)

# -- deltas = cost centers -------------------------------------------------
print("\nstage deltas (share of full fwd, per sample):")
prev = 0.0
for name, per in rows[:4]:
    print(f"  {name:22s} {(per - prev)*1e3:7.3f} ms  "
          f"{(per - prev)/t_fwd*100:5.1f}%", flush=True)
    prev = per
print(f"  {'backward pass':22s} {(per_fb - t_fwd)*1e3:7.3f} ms  "
      f"(+{(per_fb - t_fwd)/t_fwd*100:.0f}% of fwd)", flush=True)

# -- analytic roofline (see BASELINE.md "Roofline") ------------------------
# Per path segment (one bounce of one live lane), dense Cornell path:
#   intersect: N=18 planar prims x (6 dot-3 contractions ~36f + ~22f
#              interior/select) ~ 1,050 flops
#   RNG: (nslot+2) x 2-round murmur finalizers ~ 12f each ~ 150 flops
#        (threefry impl: ~600)
#   shade (lambertian/metal/dielectric/light MIS mix + textures) ~ 700 flops
#   raygen amortized ~ 150 flops
SEG_FLOPS = 2100.0
seg_per_sample = n_pix * depth  # the scan runs every lane every bounce
fl = seg_per_sample * SEG_FLOPS
VPU_F32 = 0.92e12  # v5e: 4 VPU lanes x 8x128 x 2 flop @ ~940 MHz (approx)
print(f"\nanalytic fwd flops/sample ~ {fl:.2e} ({fl/t_fwd/1e12:.2f} Tf/s "
      f"achieved; VPU f32 roofline ~{VPU_F32/1e12:.2f} Tf/s -> "
      f"{fl/t_fwd/VPU_F32*100:.0f}% of VPU speed-of-light)", flush=True)
