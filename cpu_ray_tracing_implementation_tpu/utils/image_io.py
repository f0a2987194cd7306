"""Host-side image ingestion (the stb_image / tinyexr equivalent).

The reference decodes JPEG/PNG/HDR via vendored stb_image and EXR via the
tinyexr submodule (src/image.h:33-67), then converts everything to 8-bit
bytes (src/image.h:107-117) which picture_texture rescales by 1/256
(src/texture.h:72). We mirror that pipeline host-side: decode with
PIL/imageio at scene-build time into a float32 [h,w,3] array in *byte scale*
(0..255), which ops/textures.py multiplies by 1/256 on device.

Asset note: ``assets/bathroom.exr`` is absent from the reference snapshot
(.MISSING_LARGE_BLOBS), so scenes that need the HDR skybox fall back to a
procedural substitute (``procedural_sky``).
"""

from __future__ import annotations

import os

import numpy as np

MAGENTA = np.array([255.0, 0.0, 255.0], np.float32)


def load_image(path: str) -> np.ndarray:
    """Decode to float32 [h,w,3] byte-scale. Missing/broken file -> 1x1
    magenta, matching the reference's graceful degradation (src/image.h:75)."""
    try:
        if path.lower().endswith(".exr"):
            try:
                # self-contained codec first (uncompressed scanlines —
                # covers everything film.write_exr produces)
                from cpu_ray_tracing_implementation_tpu.utils import exr

                arr = exr.read_exr(path)
            except ValueError:
                # compressed/tiled files: defer to imageio if a backend
                # exists in this environment
                import imageio.v3 as iio

                arr = np.asarray(iio.imread(path), np.float32)
            if arr.ndim == 2:
                arr = arr[..., None].repeat(3, axis=-1)
            arr = arr[..., :3]
            # float HDR -> clamped bytes, as src/image.h:107-117 does
            return np.clip(arr, 0.0, 1.0) * 255.0
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, np.float32)
    except Exception as e:  # noqa: BLE001
        print(f"[image_io] failed to load {path!r}: {e}; using magenta fallback")
        return np.broadcast_to(MAGENTA, (1, 1, 3)).copy()


def procedural_sky(height: int = 256, width: int = 512, seed: int = 7) -> np.ndarray:
    """Equirect HDR-ish substitute for the missing bathroom.exr: vertical
    gradient + a bright window blob + soft area variation. Byte-scale."""
    rng = np.random.default_rng(seed)
    v = np.linspace(0.0, 1.0, height)[:, None]
    u = np.linspace(0.0, 1.0, width)[None, :]
    base = np.stack(
        [
            0.85 - 0.45 * v + 0.0 * u,
            0.80 - 0.35 * v + 0.0 * u,
            0.95 - 0.25 * v + 0.0 * u,
        ],
        axis=-1,
    )
    # a warm bright "window"
    du = (u - 0.3) * 2.0
    dv = (v - 0.45) * 4.0
    blob = np.exp(-(du * du + dv * dv) * 18.0)[..., None]
    base = base + blob * np.array([1.6, 1.4, 1.0])
    base = base + rng.normal(0.0, 0.01, base.shape)
    return (np.clip(base, 0.0, 1.0) * 255.0).astype(np.float32)


def reference_asset(name: str) -> str:
    """Path to a reference asset, if the read-only snapshot is mounted."""
    for root in (os.environ.get("CRT_ASSETS", ""), "/root/reference/assets", "assets"):
        if root:
            p = os.path.join(root, name)
            if os.path.exists(p):
                return p
    return name
