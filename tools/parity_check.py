"""Forward-parity check against the reference C++ renderer.

Renders a scene with this framework at the reference's exact workload and
compares against a PPM produced by the reference binary (BASELINE.md
"forward parity" metric). Monte-Carlo noise makes per-pixel equality
meaningless at low spp, so the comparison is distributional: PSNR of
box-downsampled images plus global mean/percentile agreement.

Usage:
    # 1) build & run the reference (writes e.g. /tmp/refbuild/out.ppm)
    #    g++ -O3 -march=native -std=c++17 -fpermissive -w -I shim \
    #        /root/reference/src/main.cc -o ref_tracer -ltbb
    #    printf 'out.ppm\n7\n' | ./ref_tracer
    # 2) python tools/parity_check.py cornell_box /tmp/refbuild/out.ppm
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_ppm(path: str) -> np.ndarray:
    """P3 PPM -> float [H,W,3] in [0,1] (gamma space, as written)."""
    with open(path) as f:
        tok = f.read().split()
    assert tok[0] == "P3", tok[0]
    w, h, maxv = int(tok[1]), int(tok[2]), int(tok[3])
    # the reference writes unclamped >255 values for emissive pixels
    # (src/color.h:32-35); clamp on read
    data = np.clip(np.array(tok[4:4 + w * h * 3], np.float64), 0, maxv)
    return (data / maxv).reshape(h, w, 3)


def downsample(img: np.ndarray, f: int = 8) -> np.ndarray:
    h, w = (img.shape[0] // f) * f, (img.shape[1] // f) * f
    return img[:h, :w].reshape(h // f, f, w // f, f, 3).mean(axis=(1, 3))


def compare(ours: np.ndarray, ref: np.ndarray) -> dict:
    a, b = downsample(ours), downsample(ref)
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    return {
        "psnr_downsampled_db": round(psnr, 2),
        "mean_ours": round(float(ours.mean()), 4),
        "mean_ref": round(float(ref.mean()), 4),
        "mean_rel_err": round(abs(ours.mean() - ref.mean()) / ref.mean(), 4),
        "p95_abs_err_downsampled": round(float(np.percentile(np.abs(a - b), 95)), 4),
    }


def main() -> int:
    import json

    scene_name, ref_ppm = sys.argv[1], sys.argv[2]

    import jax

    from cpu_ray_tracing_implementation_tpu.models import catalog, film, integrator

    # reference workloads (src/main.cc): cornell_box = 600x600 x 40spp x d4
    scene, cam = catalog.SCENES[scene_name]()
    img = integrator.render_image(scene, cam, jax.random.key(0))
    ours_gamma = np.asarray(film.linear_to_gamma(img))

    ref = read_ppm(ref_ppm)
    stats = compare(np.clip(ours_gamma, 0, 1), ref)
    print(json.dumps(stats, indent=1))
    ok = stats["mean_rel_err"] < 0.05 and stats["psnr_downsampled_db"] > 25
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
