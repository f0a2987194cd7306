"""Profile the headline fwd+bwd workload and print the top HLO cost centers.

Captures a jax.profiler device trace of diff.loss_and_grads on a
reduced-spp Cornell (same per-sample graph as bench.py), then parses the
xplane with tensorboard_plugin_profile into per-op self-time totals.
Also times forward-only vs fwd+bwd at the same spp to split the pipeline.

Run on the chip:  python tools/profile_bench.py [spp]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.models import catalog, diff, integrator

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 32
scene, cam = catalog.cornell_box(width=512, spp=spp, max_depth=8)
target = jnp.zeros((cam.height, cam.width, 3))
key = jax.random.key(0)

# -- timings: forward vs fwd+bwd ------------------------------------------
img = integrator.render_image(scene, cam, key, spp=spp)
np.asarray(img)
t0 = time.time()
np.asarray(integrator.render_image(scene, cam, jax.random.key(1), spp=spp))
t_fwd = time.time() - t0
print(f"forward-only {spp}spp: {t_fwd:.3f}s "
      f"({512*512*spp/t_fwd/1e6:.1f} M rays/s)", flush=True)

loss, (gs, gc) = diff.loss_and_grads(scene, cam, key, target, spp=spp)
np.asarray(loss)
t0 = time.time()
loss, (gs, gc) = diff.loss_and_grads(scene, cam, jax.random.key(1), target,
                                     spp=spp)
np.asarray(loss); np.asarray(gs["tex_color0"])
t_fb = time.time() - t0
print(f"fwd+bwd      {spp}spp: {t_fb:.3f}s "
      f"({512*512*spp/t_fb/1e6:.1f} M rays/s)  bwd/fwd = "
      f"{(t_fb-t_fwd)/t_fwd:.2f}x", flush=True)

# -- cost analysis ---------------------------------------------------------
for name, fn, args in [
    ("fwd", lambda s, c, k: integrator.render_image(s, c, k, spp=spp),
     (scene, cam, key)),
    ("fwd+bwd", lambda s, c, k, t: diff.loss_and_grads(s, c, k, t, spp=spp),
     (scene, cam, key, target)),
]:
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        print(f"cost[{name}]: flops={cost.get('flops', 0):.3e} "
              f"bytes={cost.get('bytes accessed', 0):.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"cost[{name}] unavailable: {e}", flush=True)

# -- device trace ----------------------------------------------------------
logdir = "/tmp/jaxprof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    loss, _ = diff.loss_and_grads(scene, cam, jax.random.key(2), target,
                                  spp=spp)
    np.asarray(loss)

xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplanes, flush=True)
if xplanes:
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

        data, _ = r2t.xspace_to_tool_data(xplanes, "hlo_op_stats^", {})
        out = "/tmp/jaxprof_opstats.csv"
        with open(out, "wb") as f:
            f.write(data if isinstance(data, bytes) else data.encode())
        print(f"wrote {out}", flush=True)
        import csv
        import io

        text = data.decode() if isinstance(data, bytes) else data
        rows = list(csv.DictReader(io.StringIO(text)))
        if rows:
            keyf = ("total_self_time" if "total_self_time" in rows[0]
                    else ("self_time_us" if "self_time_us" in rows[0]
                          else list(rows[0])[0]))
            rows.sort(key=lambda r: -float(r.get(keyf, 0) or 0))
            cols = [c for c in ("category", "operation", keyf, "occurrences")
                    if c in rows[0]]
            print("top ops by", keyf)
            for r in rows[:25]:
                print("  ", {c: r[c] for c in cols}, flush=True)
    except Exception as e:  # noqa: BLE001
        print("op_stats parse failed:", repr(e), flush=True)
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
            data, _ = r2t.xspace_to_tool_data(xplanes, "overview_page^", {})
            open("/tmp/jaxprof_overview.json", "wb").write(
                data if isinstance(data, bytes) else data.encode())
            print("wrote /tmp/jaxprof_overview.json", flush=True)
        except Exception as e2:  # noqa: BLE001
            print("overview failed too:", repr(e2), flush=True)
