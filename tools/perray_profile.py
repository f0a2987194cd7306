"""Stage attribution for the per-ray visit-list accelerator on a large
chunked scene (the colonnade): time the fused Pallas cull+select, the
row-gather sweep, and the end-to-end intersect.

Two timing modes per stage:
 - single-dispatch min-of-N ("+disp"): includes the axon tunnel's fixed
   ~20-30 ms per-dispatch cost — DO NOT read these as device time (the
   round-3 "60 ms/bounce" attribution made that mistake);
 - chained-iteration slope ("device"): N data-dependent calls inside ONE
   dispatch, slope over N = true device cost (round-4 measured the
   end-to-end intersect at 34.5 ms/bounce this way, not 60).

Usage: python tools/perray_profile.py [width] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod  # noqa: E402
from cpu_ray_tracing_implementation_tpu.models import catalog  # noqa: E402
from cpu_ray_tracing_implementation_tpu.ops import pallas_select as ps  # noqa: E402
from cpu_ray_tracing_implementation_tpu.ops import perray  # noqa: E402


def best_of(fn, reps=5):
    fn()  # warm-up/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    scene, cam = catalog.sponza(width=width, spp=4)
    chunks = scene.tri_chunks
    K, C = chunks.corner.shape[:2]
    print(f"colonnade {K} chunks x {C} prims, {width}x{width} rays")

    n = cam.width * cam.height
    pix = jnp.arange(n, dtype=jnp.int32)
    u = jax.random.uniform(jax.random.key(0), (n, cam_mod.N_CAM_SLOTS))
    org, dirs, _t = cam_mod.generate_rays(cam, pix, u)
    if scene.world_offset is not None:
        org = org - scene.world_offset[None, :]
    tmin = 1e-3
    V = perray._visit_block()

    # All timed functions reduce to a scalar before the host fetch — the
    # tunnel's result transfer would otherwise dominate (a [R,V] ids fetch
    # is ~2.6 MB; a scalar is 4 bytes).

    # ---- end-to-end intersect
    full = jax.jit(lambda o, d: jnp.nansum(jnp.where(
        jnp.isfinite(t_ := perray.planar_closest_perray(
            o, d, chunks, tmin, True)[0]), t_, 0.0)))
    t_full = best_of(lambda: np.asarray(full(org, dirs)), reps)
    hit = jax.jit(lambda o, d: jnp.mean(jnp.isfinite(
        perray.planar_closest_perray(o, d, chunks, tmin, True)[0]) * 1.0))
    print(f"end-to-end intersect: {t_full*1e3:8.1f} ms  (+disp)  "
          f"(hit {float(hit(org, dirs)):.0%})")

    # device-true slope: chain N dependent intersects in one dispatch
    def chain(iters):
        @jax.jit
        def run(o, d):
            def body(c, _):
                o_, d_ = c
                t_ = perray.planar_closest_perray(o_, d_, chunks, tmin,
                                                  True)[0]
                o2 = o_ + jnp.where(jnp.isfinite(t_), 1e-7 * t_, 0.0)[:, None]
                return (o2, d_), None
            c, _ = jax.lax.scan(body, (o, d), None, length=iters)
            return c[0].sum()
        return run

    t2 = best_of(lambda f=chain(2): np.asarray(f(org, dirs)), reps)
    t8 = best_of(lambda f=chain(8): np.asarray(f(org, dirs)), reps)
    print(f"end-to-end intersect: {(t8 - t2) / 6 * 1e3:8.1f} ms  (device, "
          f"chained slope; fixed dispatch ~{(t2 - (t8 - t2) / 3) * 1e3:.0f} ms)")

    # ---- phase-1 cull+select alone (the Pallas kernel)
    cap = jnp.full((n,), jnp.inf, jnp.float32)
    boxes = ps.pack_boxes(chunks.lo, chunks.hi)
    rays, Rp = ps.pad_rays(ps.pack_rays(org, dirs, cap), boxes.shape[1])
    excl0 = jnp.concatenate([jnp.full((Rp, 1), -1e30, jnp.float32),
                             jnp.full((Rp, 1), -1.0, jnp.float32)], axis=1)

    def _sel_scalar(r, b, e):
        ids, nears, rest = ps.cull_select(r, b, e, V, K, tmin)
        return (jnp.sum(ids) + jnp.sum(rest)
                + jnp.sum(jnp.where(jnp.isfinite(nears), nears, 0.0)))

    sel_s = jax.jit(_sel_scalar)
    t_sel = best_of(lambda: np.asarray(sel_s(rays, boxes, excl0)), reps)
    print(f"cull+select (1 phase): {t_sel*1e3:6.1f} ms  (+disp)")

    # ---- sweep alone on the phase-1 lists
    sel = jax.jit(lambda r, b, e: ps.cull_select(r, b, e, V, K, tmin))
    ids, nears, rest = sel(rays, boxes, excl0)
    ids_r, nears_r = ids[:n], nears[:n]
    table = perray._planar_table(chunks)
    best0 = (cap, jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.float32),
             jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.int32),
             jnp.zeros((n,), jnp.int32))
    swp = jax.jit(lambda i, nr: jnp.nansum(jnp.where(
        jnp.isfinite(t_ := perray._planar_sweep(
            org, dirs, table, C, jnp.clip(i, 0, K - 1), nr, tmin, True,
            best0)[0]), t_, 0.0)))
    t_swp = best_of(lambda: np.asarray(swp(ids_r, nears_r)), reps)
    print(f"sweep (phase-1 lists): {t_swp*1e3:6.1f} ms  (+disp)")

    # visit statistics
    crossed = np.isfinite(np.asarray(nears_r)).sum(1)
    print(f"phase-1 crossed chunks/ray: mean {crossed.mean():.1f} "
          f"p90 {np.percentile(crossed, 90):.0f} max {crossed.max()}")


if __name__ == "__main__":
    main()
