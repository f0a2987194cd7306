"""Traversal diagnostics on the current backend: iteration counts, visit
distribution, and raw traversal wall-clock vs the chunk paths."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp

scene_name = sys.argv[1] if len(sys.argv) > 1 else "sphereflake"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 160_000

from cpu_ray_tracing_implementation_tpu.models import catalog, camera as cam_mod, integrator
from cpu_ray_tracing_implementation_tpu.ops import bvh as bvh_mod, chunked

scene, cam = catalog.SCENES[scene_name](width=400, spp=1)
key = jax.random.key(0)
pix = jnp.arange(R, dtype=jnp.int32) % (cam.width * cam.height)
u = jax.vmap(lambda k: jax.random.uniform(k, (cam_mod.N_CAM_SLOTS,)))(
    jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pix))
org, dirs, tm = cam_mod.generate_rays(cam, pix, u)

tree = scene.sphere_tree if scene.sphere_tree is not None else scene.tri_tree
chunks = scene.sphere_chunks if scene.sphere_chunks is not None else scene.tri_chunks
is_sphere = scene.sphere_tree is not None
print(f"{scene_name}: nodes={tree.node_pack.shape[0]} prims~{tree.prim_pack.shape[0]}", flush=True)

it, nv, lv = jax.jit(bvh_mod.traversal_stats, static_argnames=())(org, dirs, tree, 1e-3)
it, nv, lv = int(it), np.asarray(nv), np.asarray(lv)
print(f"camera rays R={R}: iterations(max visits)={it}  node visits mean={nv.mean():.1f} p50={np.percentile(nv,50):.0f} p99={np.percentile(nv,99):.0f} max={nv.max()}")
print(f"  leaf visits mean={lv.mean():.1f} p99={np.percentile(lv,99):.0f} max={lv.max()}", flush=True)

def timeit(f, *a):
    r = f(*a); jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.time(); r = f(*a); jax.tree.map(lambda x: np.asarray(x), r)
    return time.time() - t0

if is_sphere:
    f_bvh = jax.jit(lambda o,d,t: bvh_mod.sphere_closest_bvh(o, d, jnp.zeros(o.shape[0]), tree, 1e-3))
    f_chk = jax.jit(lambda o,d,t: chunked.sphere_closest(o, d, jnp.zeros(o.shape[0]), chunks, 1e-3))
else:
    f_bvh = jax.jit(lambda o,d,t: bvh_mod.planar_closest_bvh(o, d, tree, 1e-3, True))
    f_chk = jax.jit(lambda o,d,t: chunked.planar_closest(o, d, chunks, 1e-3, True))
print(f"one closest-hit pass, camera rays: bvh={timeit(f_bvh,org,dirs,tm)*1e3:.1f}ms chunked={timeit(f_chk,org,dirs,tm)*1e3:.1f}ms", flush=True)

# incoherent (bounce-like) rays: random origins inside scene bbox, random dirs
k1, k2 = jax.random.split(key)
lo = np.asarray(tree.node_pack[0, 0:3]); hi = np.asarray(tree.node_pack[0, 3:6])
org2 = jax.random.uniform(k1, (R, 3)) * (hi - lo) + lo
d2 = jax.random.normal(k2, (R, 3)); d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
it2, nv2, lv2 = jax.jit(bvh_mod.traversal_stats)(org2, d2, tree, 1e-3)
nv2 = np.asarray(nv2); lv2 = np.asarray(lv2)
print(f"incoherent rays: iterations={int(it2)} node visits mean={nv2.mean():.1f} p99={np.percentile(nv2,99):.0f}")
print(f"one closest-hit pass, incoherent: bvh={timeit(f_bvh,org2,d2,tm)*1e3:.1f}ms chunked={timeit(f_chk,org2,d2,tm)*1e3:.1f}ms", flush=True)
