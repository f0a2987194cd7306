"""Film: tone mapping + image output.

Replaces reference src/color.h:16-36 (gamma 1/2.2 then "R G B" PPM rows).
Divergence fix (SURVEY.md appendix item 1): the reference never clamps, so
emissive pixels >1.0 write bytes >255 into the P3 file; we clamp to [0, 1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

GAMMA = 1.0 / 2.2


def linear_to_gamma(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(jnp.maximum(img, 0.0), GAMMA)


def to_bytes(img) -> np.ndarray:
    """linear [H,W,3] float -> uint8 with gamma 1/2.2 and a clamp."""
    g = np.asarray(linear_to_gamma(jnp.asarray(img)))
    g = np.nan_to_num(g, nan=0.0, posinf=1.0, neginf=0.0)
    return (255.999 * np.clip(g, 0.0, 0.999)).astype(np.uint8)


def write_ppm(path: str, img) -> None:
    """P3 PPM, matching the reference's output container (src/camera.h:149-151)."""
    data = to_bytes(img)
    h, w, _ = data.shape
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        flat = data.reshape(-1, 3)
        f.write("\n".join(f"{r} {g} {b}" for r, g, b in flat))
        f.write("\n")


def write_png(path: str, img) -> None:
    from PIL import Image

    Image.fromarray(to_bytes(img)).save(path)


def write_exr(path: str, img, half: bool = False) -> None:
    """Full-fidelity linear-radiance HDR output (no gamma, no clamp) via
    the self-contained EXR codec (utils/exr.py) — the output side the
    reference's vendored tinyexr never exposes."""
    from cpu_ray_tracing_implementation_tpu.utils import exr

    a = np.asarray(jnp.asarray(img), np.float32)
    exr.write_exr(path, np.nan_to_num(a, nan=0.0), half=half)
