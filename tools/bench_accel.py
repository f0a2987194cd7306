import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax

mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
scene_name = sys.argv[2] if len(sys.argv) > 2 else "sphereflake"
width = int(sys.argv[3]) if len(sys.argv) > 3 else 200
spp = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["CRT_ACCEL"] = mode

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator

scene, cam = catalog.SCENES[scene_name](width=width, spp=spp)
print(f"{scene_name} {cam.width}x{cam.height} spp={spp} depth={cam.max_depth} mode={mode}", flush=True)
key = jax.random.key(0)
t0 = time.time()
img = np.asarray(integrator.render_image(scene, cam, key, spp=spp))
print(f"  compile+run: {time.time()-t0:.2f}s mean={img.mean():.4f}", flush=True)
t0 = time.time()
img = np.asarray(integrator.render_image(scene, cam, jax.random.key(1), spp=spp))
dt = time.time() - t0
rays = cam.width * cam.height * spp
print(f"  steady: {dt:.3f}s  {rays/dt/1e6:.2f} M camera rays/s", flush=True)
