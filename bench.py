"""Benchmark runner: one JSON line for the driver.

Headline metric: camera rays/s on the north-star workload (BASELINE.json) —
Cornell box 512x512, 256 spp, max_depth 8 — on whatever device JAX gives us
(the real TPU chip under the driver).

vs_baseline: ratio against the reference C++ renderer on the *reference's own*
Cornell workload (600x600, 40 spp, depth 4; src/main.cc:222-224). The
reference binary (g++ -O3 -march=native, tinyexr stubbed, 4-core
std::execution::par_unseq) rendered that workload in 34.8 s on this host
= 4.14e5 camera rays/s (measured 2026-08-16; see BASELINE.md). We re-measure
our own throughput on the exact same workload for the ratio.

Timing methodology: device->host fetch (np.asarray) is forced before stopping
the clock — block_until_ready alone returns early under the axon tunnel.
"""

import json
import time

import jax
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator

REF_CORNELL_RAYS_PER_S = 14_400_000 / 34.8  # reference C++ on 4-core host CPU


def _time_render(scene, cam, spp, key):
    img = integrator.render_image(scene, cam, key, spp=spp)
    np.asarray(img)  # warm-up: compile + run
    t0 = time.time()
    img = integrator.render_image(scene, cam, jax.random.fold_in(key, 1), spp=spp)
    a = np.asarray(img)
    dt = time.time() - t0
    assert np.isfinite(a).all()
    return cam.width * cam.height * spp / dt


def main():
    # north-star workload (BASELINE.json): Cornell 512x512, 256 spp, depth 8
    scene, cam = catalog.cornell_box(width=512, spp=256, max_depth=8)
    headline = _time_render(scene, cam, 256, jax.random.key(0))

    # reference-matched workload for the baseline ratio
    scene_m, cam_m = catalog.cornell_box(width=600, spp=40, max_depth=4)
    matched = _time_render(scene_m, cam_m, 40, jax.random.key(0))

    print(json.dumps({
        "metric": "cornell_512x512_256spp_d8_camera_rays_per_s",
        "value": round(headline),
        "unit": "rays/s",
        "vs_baseline": round(matched / REF_CORNELL_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
