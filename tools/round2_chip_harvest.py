"""One-shot chip measurement harvest for the round-2 feature set.

Run ON THE TPU (default platform) when the axon tunnel is up:

    /opt/venv/bin/python tools/round2_chip_harvest.py [--quick]

Prints a BASELINE.md-ready table of:
  1. headline fwd+bwd (same as bench.py, sanity cross-check)
  2. matched forward workload, slope-timed (Cornell 600x600, d4)
  3. forward with QMC on (estimator-quality features' runtime cost)
  4. wavefront vs classic forward; wavefront + RR(3)
  5. sphereflake + colonnade steady-state (accel regression check)
  6. denoiser + AOV pass runtime at 512px

Every timing forces device->host fetch (np.asarray) before the clock
stops — block_until_ready returns early over the tunnel — and uses
best-of-3 two-point spp slopes where the fixed ~35-120 ms dispatch
overhead would otherwise dominate (BASELINE.md methodology).
"""

import argparse
import sys
import time

import numpy as np

_SZ = 1.0  # --smoke shrinks every workload


def _px(n):
    return max(16, int(n * _SZ))


sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

from cpu_ray_tracing_implementation_tpu.models import (  # noqa: E402
    aov, catalog, diff, integrator)
from cpu_ray_tracing_implementation_tpu.utils import denoise  # noqa: E402


def _sync(x):
    np.asarray(x)


def slope(fn, lo, hi, reps=3):
    """Best-of-reps two-point slope: seconds per unit of work."""
    fn(lo), fn(hi)  # compile both shapes

    def best(n):
        ts = []
        for r in range(reps):
            t0 = time.time()
            fn(n, seed=1 + r)
            ts.append(time.time() - t0)
        return min(ts)

    return (best(hi) - best(lo)) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller workloads (cold compile cache)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny workloads: validates the script end-to-end "
                         "on the CPU backend (numbers meaningless)")
    args = ap.parse_args()
    q = args.quick or args.smoke
    if args.smoke:
        global _SZ
        _SZ = 0.125
    print(f"device: {jax.devices()[0]}")
    rows = []

    # 1. headline fwd+bwd (bench.py's metric)
    scene, cam = catalog.cornell_box(width=_px(256 if q else 512),
                                     spp=16 if _SZ < 1 else (64 if q else 256), max_depth=8)
    target = np.zeros((cam.height, cam.width, 3), np.float32)

    def fwd_bwd(spp, seed=0):
        loss, (gs, _) = diff.loss_and_grads(scene, cam, jax.random.key(seed),
                                            target, spp=spp)
        _sync(gs["tex_color0"])

    spp_hi = 16 if _SZ < 1 else (64 if q else 256)
    per_s = slope(fwd_bwd, spp_hi // 4, spp_hi)
    rows.append(("fwd+bwd Cornell d8 (rays/s)",
                 f"{cam.width * cam.height / per_s / 1e6:.2f} M"))

    # 2-3. matched forward, PRNG vs QMC
    for label, qmc in (("forward d4 (rays/s)", False),
                       ("forward d4 + QMC (rays/s)", True)):
        s2, c2 = catalog.cornell_box(width=_px(300 if q else 600), spp=40,
                                     max_depth=4)
        c2 = c2.replace(qmc=qmc)

        def fwd(spp, seed=0, s2=s2, c2=c2):
            _sync(integrator.render_image(s2, c2, jax.random.key(seed),
                                          spp=spp))

        per_s = slope(fwd, 8, 24) if _SZ < 1 else slope(fwd, 40, 120)
        rows.append((label, f"{c2.width * c2.height / per_s / 1e6:.2f} M"))

    # 4. wavefront forward, plain and with RR
    s3, c3 = catalog.cornell_box(width=_px(256 if q else 512), spp=64,
                                 max_depth=8)
    for label, c in (("wavefront d8 (rays/s)", c3),
                     ("wavefront d8 + RR(3) (rays/s)",
                      c3.replace(rr_depth=3))):
        def wf(spp, seed=0, c=c):
            _sync(integrator.render_wavefront(s3, c, jax.random.key(seed),
                                              spp))

        per_s = slope(wf, 4, 12) if _SZ < 1 else slope(wf, 16, 64)
        rows.append((label, f"{c.width * c.height / per_s / 1e6:.2f} M"))

    # 5. large-scene steady state (single-shot; seconds-scale)
    for name, w, spp in (("sphereflake", _px(200 if q else 400), 8 if _SZ < 1 else 50),
                         ("sponza", _px(100 if q else 200), 4 if _SZ < 1 else 30)):
        s4, c4 = catalog.SCENES[name](width=w, spp=spp)
        _sync(integrator.render_image(s4, c4, jax.random.key(0)))  # compile
        t0 = time.time()
        _sync(integrator.render_image(s4, c4, jax.random.key(1)))
        rows.append((f"{name} {w}px {spp}spp (s)", f"{time.time() - t0:.2f}"))

    # 6. AOV + denoise pass
    s5, c5 = catalog.cornell_box(width=_px(256 if q else 512), spp=8)
    img = integrator.render_image(s5, c5, jax.random.key(0))
    bufs = aov.render_aovs(s5, c5, jax.random.key(0), spp=8)
    _sync(denoise.denoise(img, bufs))  # compile
    t0 = time.time()
    _sync(denoise.denoise(img, bufs))
    bufs2 = aov.render_aovs(s5, c5, jax.random.key(1), spp=8)
    _sync(bufs2["normal"])
    rows.append((f"AOV+denoise {c5.width}px (s)", f"{time.time() - t0:.2f}"))

    print()
    print("| Metric | Value |")
    print("|---|---|")
    for k, v in rows:
        print(f"| {k} | {v} |")


if __name__ == "__main__":
    main()
