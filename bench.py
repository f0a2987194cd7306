"""Benchmark runner: one JSON line for the driver.

Headline metric (matches BASELINE.json's north star): camera rays/s through
a full FORWARD + BACKWARD pass — render the Cornell box at 512x512, 256 spp,
max_depth 8 and take gradients of a scalar image loss w.r.t. the
differentiable scene parameters (albedo/emission/material params) — on
whatever device JAX gives us (the real TPU chip under the driver).

vs_baseline: ratio of our FORWARD throughput against the reference C++
renderer on the reference's own Cornell workload (600x600, 40 spp, depth 4;
src/main.cc:222-224). The reference binary (g++ -O3 -march=native, tinyexr
stubbed, 4-core std::execution::par_unseq) rendered that workload in 34.8 s
on this host = 4.14e5 camera rays/s (measured 2026-08-16, BASELINE.md). The
reference has no backward pass at all, so the comparable number is forward.

Timing: device->host fetches are forced before stopping the clock
(block_until_ready returns early under the axon tunnel), and a warm-up run
absorbs compilation.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, diff, integrator

REF_CORNELL_RAYS_PER_S = 14_400_000 / 34.8  # reference C++ on 4-core host CPU

# ---- speed-of-light model for one TPU v5e (v5 lite) chip ----
# Published chip specs: 197 TFLOP/s bf16 MXU, 819 GB/s HBM. This workload's
# geometry matmuls run precision=highest (f32 via multi-pass bf16, ~1/6 of
# bf16 peak) and most of its FLOPs are elementwise VPU work (~7 TFLOP/s
# f32). The honest compute ceiling for this op mix is therefore the VPU
# rate; MFU is also reported against the bf16 MXU peak as the chip's
# absolute speed-of-light. Details + derivation: BASELINE.md "Roofline".
PEAK_HBM_BYTES_S = 819e9
PEAK_VPU_FLOPS_S = 7e12
PEAK_CHIP_FLOPS_S = 197e12


def _roofline(fn, args, dt):
    """(dict of roofline fields) for a jitted callable timed at ``dt``."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return {}
    if not flops:
        return {}
    bound_s = max(flops / PEAK_VPU_FLOPS_S, byts / PEAK_HBM_BYTES_S)
    return {
        "xla_flops": flops,
        "xla_bytes": byts,
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "mfu_pct": round(100.0 * flops / dt / PEAK_CHIP_FLOPS_S, 2),
        "roofline_frac": round(bound_s / dt, 3),
        "bound": ("compute" if flops / PEAK_VPU_FLOPS_S
                  > byts / PEAK_HBM_BYTES_S else "memory"),
    }


def _sync(*arrays):
    for a in arrays:
        np.asarray(a)


def main():
    # north-star workload: Cornell 512x512, 256 spp, depth 8, fwd+bwd
    scene, cam = catalog.cornell_box(width=512, spp=256, max_depth=8)
    target = jnp.zeros((cam.height, cam.width, 3))

    loss, (gs, _gc) = diff.loss_and_grads(scene, cam, jax.random.key(0),
                                          target, spp=256)
    _sync(loss, gs["tex_color0"])  # warm-up: compile + run
    t0 = time.time()
    loss, (gs, _gc) = diff.loss_and_grads(scene, cam, jax.random.key(1),
                                          target, spp=256)
    _sync(loss, gs["tex_color0"])
    dt = time.time() - t0
    assert np.isfinite(float(loss))
    headline = 512 * 512 * 256 / dt

    # reference-matched forward workload for the baseline ratio
    scene_m, cam_m = catalog.cornell_box(width=600, spp=40, max_depth=4)
    img = integrator.render_image(scene_m, cam_m, jax.random.key(0), spp=40)
    _sync(img)
    t0 = time.time()
    img = integrator.render_image(scene_m, cam_m, jax.random.key(1), spp=40)
    a = np.asarray(img)
    fwd_matched = 600 * 600 * 40 / (time.time() - t0)
    assert np.isfinite(a).all(), "matched-workload render produced non-finite pixels"

    # roofline accounting of the headline fwd+bwd step (BASELINE.md §Roofline)
    roof = _roofline(
        lambda s, c, k, t: diff.loss_and_grads(s, c, k, t, spp=256),
        (scene, cam, jax.random.key(1), target), dt)

    print(json.dumps({
        "metric": "cornell_512x512_256spp_d8_fwd_bwd_camera_rays_per_s",
        "value": round(headline),
        "unit": "rays/s",
        "vs_baseline": round(fwd_matched / REF_CORNELL_RAYS_PER_S, 2),
        **roof,
    }))


if __name__ == "__main__":
    main()
