"""A/B the dense-table fused-kernel routing on the chip.

Cornell 600x600 forward, slope-timed between spp=40 and spp=120 (best-of-3
per point — the tunnel adds a fixed dispatch term and hiccups only ever
add time; BASELINE.md methodology). Run on the TPU chip:

    python tools/bench_dense_pallas.py            # pallas dense routing
    CRT_DENSE_PALLAS=0 python tools/bench_dense_pallas.py   # XLA dense
"""

import os
import time

import jax
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator


def main():
    scene, cam = catalog.cornell_box(width=600, spp=40, max_depth=4)
    print("backend:", jax.default_backend(),
          "dense_pallas:", os.environ.get("CRT_DENSE_PALLAS", "1"))

    def render(spp, k):
        img = integrator.render_image(scene, cam, k, spp=spp)
        a = np.asarray(img)
        assert np.isfinite(a).all()
        return a

    img = render(40, jax.random.key(0))
    print("mean:", float(img.mean()))
    render(120, jax.random.key(0))

    def best_of(spp, reps=3):
        ts = []
        for r in range(reps):
            t0 = time.time()
            render(spp, jax.random.key(1 + r))
            ts.append(time.time() - t0)
        return min(ts)

    t_lo = best_of(40)
    t_hi = best_of(120)
    per_sample = (t_hi - t_lo) / 80.0
    rays_s = 600 * 600 / per_sample * 1e-6
    print(f"t40={t_lo:.3f}s t120={t_hi:.3f}s per_spp={per_sample*1e3:.2f}ms "
          f"fwd={rays_s:.1f}M rays/s")


if __name__ == "__main__":
    main()
