"""Probe the round-1 MAX_PALLAS_CHUNKS=512 cap: run the fused planar kernel
compiled (not interpret) at increasing chunk counts and report where (or
whether) it faults. Run on the chip: python tools/pallas_cap_probe.py [K...]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.models import scene as sm
from cpu_ray_tracing_implementation_tpu.ops import chunked, pallas_intersect as pk

ks = [int(a) for a in sys.argv[1:]] or [600, 1024, 2016, 2500]
R = 4096
rng = np.random.default_rng(0)
org = jnp.asarray(rng.normal(0, 3, (R, 3)), jnp.float32)
d = rng.normal(0, 1, (R, 3)); d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)

for K in ks:
    n = K * chunked.CHUNK  # one prim per chunk row
    b = sm.SceneBuilder()
    m = b.lambertian((.5, .5, .5))
    centers = rng.normal(0, 20, (n, 3))
    verts = centers[:, None, :] + rng.normal(0, .2, (n, 3, 3))
    b.triangles(verts, m)
    sc = b.build()
    kk = sc.tri_chunks.corner.shape[0]
    print(f"K={kk} ({n} tris): compiling fused kernel...", flush=True)
    try:
        t0 = time.time()
        t, _ = pk.planar_closest_pallas(org, d, sc.tri_chunks, 1e-3,
                                        triangle=True)
        tp = np.asarray(t)
        t_ref, _ = chunked.planar_closest(org, d, sc.tri_chunks, 1e-3,
                                          triangle=True)
        tr = np.asarray(t_ref)
        hit = np.isfinite(tr)
        ok = (np.isfinite(tp) == hit).all() and np.allclose(
            tp[hit], tr[hit], rtol=2e-3)
        print(f"  OK in {time.time()-t0:.1f}s, parity={'PASS' if ok else 'FAIL'},"
              f" hits={hit.sum()}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  FAULT: {type(e).__name__}: {str(e)[:300]}", flush=True)
        break
