"""Head-to-head: reference C++ BVH vs this framework on IDENTICAL geometry.

Round-5 VERDICT item 2: every reference-vs-repo number used to be on dense
scenes; the reference's BVH-at-scale workload (sponza, 200x200 x 30 spp x
depth 5, /root/reference/src/main.cc:439-498) had never been timed on the
same triangles. This harness renders OUR side of that comparison from the
exact .gltf the reference binary loads (tools/export_colonnade_gltf.py;
the loader round-trip is bitwise), with the reference sponza scene's exact
composition: white lambertian triangles, the (0,1200,0)+(500,0,0)+(0,0,500)
quad light emitting 10, BLACK background, identical camera.

Usage:
    python tools/export_colonnade_gltf.py /tmp/refws
    cd /tmp/refws && printf 'sponza_ref.ppm\n14\n' | /path/to/ref_tracer
    python tools/colonnade_headtohead.py /tmp/refws [ref_elapsed_seconds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refws"
    ref_secs = float(sys.argv[2]) if len(sys.argv) > 2 else None

    import jax

    from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod
    from cpu_ray_tracing_implementation_tpu.models import integrator, scene as scene_mod
    from cpu_ray_tracing_implementation_tpu.utils import gltf

    verts = gltf.load_triangles(
        os.path.join(workdir, "assets", "Sponza", "glTF", "Sponza.gltf"))
    assert len(verts), "export the colonnade first (export_colonnade_gltf.py)"

    b = scene_mod.SceneBuilder()
    white = b.lambertian((1.0, 1.0, 1.0))
    b.triangles(verts, white)
    light_q = b.quad((0, 1200, 0), (500, 0, 0), (0, 0, 500),
                     b.diffuse_light((10, 10, 10)))
    b.light(light_q)
    # background stays unset: black on miss, as the reference sponza scene
    scene = b.build()
    cam = cam_mod.perspective(200, 1.0, (500, 320, 90), (0, 280, 0), 1,
                              45.0, 30, 5)
    key = jax.random.key(0)

    print(f"backend: {jax.devices()[0].platform}; "
          f"{len(verts)} triangles, 200x200 x 30 spp x depth 5")
    img = integrator.render_image_wavefront(scene, cam, key)
    np.asarray(img)  # compile + settle
    t0 = time.time()
    img = np.asarray(integrator.render_image_wavefront(scene, cam, key))
    dt = time.time() - t0
    rays = 200 * 200 * 30
    print(f"ours (wavefront, steady-state): {dt:.2f} s "
          f"= {rays / dt / 1e6:.3f} M camera rays/s")
    np.save(os.path.join(workdir, "ours_linear.npy"), img)

    ppm = os.path.join(workdir, "sponza_ref.ppm")
    if os.path.exists(ppm):
        from parity_check import compare, read_ppm

        ref = read_ppm(ppm)
        ours_gamma = np.clip(img, 0, 1) ** (1 / 2.2)
        stats = compare(np.clip(ours_gamma, 0, 1), ref)
        print("image agreement vs reference render:", stats)
    if ref_secs:
        print(f"reference CPU: {ref_secs:.1f} s = "
              f"{rays / ref_secs / 1e6:.4f} M camera rays/s; "
              f"ratio ours/reference = {ref_secs / dt:.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
