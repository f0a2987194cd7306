"""Environment-light importance sampling (opt-in per scene).

Beyond-parity extension: in the reference, the background is only ever
found by BSDF sampling (src/camera.h:205-210 returns the miss color) — a
small bright sky region (a sun) makes every diffuse surface noisy. Here
``SceneBuilder.set_background(tex, importance_sample=True)`` tabulates the
background's luminance on an equirect grid at build time and registers the
environment as one more light in the MIS mixture (ops/materials.py):
directions are drawn proportional to texel luminance x sin(theta), and the
mixture pdf gains the matching term, so bright-sky paths are found by
construction instead of by luck.

The pdf table is an importance function, not the radiance itself — the
estimator stays unbiased at any table resolution because the miss shade
still evaluates the exact background texture, and every texel carries a
small floor mass so pdf > 0 wherever radiance > 0.

Direction <-> (u, v) uses exactly the sphere_uv convention
(ops/intersect.py:133-137): theta = arccos(-y) = pi*v,
phi = atan2(-z, x) + pi = 2*pi*u.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm
from cpu_ray_tracing_implementation_tpu.ops.textures import eval_texture

PI = np.float32(np.pi)


def dir_from_uv(u, v):
    """Unit direction whose sphere_uv is (u, v)."""
    theta = PI * jnp.asarray(v)
    a = 2.0 * PI * jnp.asarray(u) - PI
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(a), -jnp.cos(theta), -st * jnp.sin(a)],
                     axis=-1)


def build_tables(scene, res=(64, 128)):
    """(p_texel [H,W] per-texel probability, row_cdf [H], col_cdf [H,W])
    for the scene's background texture, host-side at build time.

    The stored table is the DISCRETE texel probability; pdf() converts it
    to a solid-angle density at the actual direction's sin(theta) — using
    the texel-center sin would misstate the realized density within a
    texel (unboundedly so in the polar rows) and bias every MIS weight."""
    h, w = res
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uu, vv = jnp.meshgrid(u, v)  # [H,W]
    dirs = dir_from_uv(uu.ravel(), vv.ravel())
    tex_id = jnp.full((h * w,), scene.background, jnp.int32)
    rgb = eval_texture(scene, tex_id, uu.ravel(), vv.ravel(), dirs)
    lum = (0.2126 * rgb[:, 0] + 0.7152 * rgb[:, 1]
           + 0.0722 * rgb[:, 2]).reshape(h, w)
    sin_t = jnp.sin(PI * v)[:, None]                      # [H,1]
    mass = jnp.maximum(lum, 0.0) * sin_t
    # floor mass: pdf must be > 0 anywhere radiance could be > 0
    mass = mass + (jnp.mean(mass) + 1e-6) * 1e-3 * sin_t
    total = jnp.sum(mass)
    p_texel = mass / total                                # [H,W]

    row_mass = jnp.sum(p_texel, axis=1)                   # [H]
    row_cdf = jnp.cumsum(row_mass)
    col_cdf = jnp.cumsum(p_texel / jnp.maximum(row_mass, 1e-20)[:, None],
                         axis=1)
    return (p_texel.astype(jnp.float32), row_cdf.astype(jnp.float32),
            col_cdf.astype(jnp.float32))


def _pick(cdf: jnp.ndarray, x: jnp.ndarray):
    """(index, intra-segment remainder) of x in a cumulative table.
    ``cdf`` [..., N] broadcast against x [...]."""
    n = cdf.shape[-1]
    if cdf.ndim == 1:
        cdf = jnp.broadcast_to(cdf, x.shape + (n,))
    idx = jnp.sum((cdf < x[..., None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, n - 1)
    lo = jnp.where(idx > 0, jnp.take_along_axis(
        cdf, jnp.maximum(idx - 1, 0)[..., None], axis=-1)[..., 0], 0.0)
    hi = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    frac = jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    return idx, frac


def sample(scene, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """[R,3] environment directions ~ the tabulated importance.

    The CDF-segment remainders are re-used as intra-texel jitter (exact:
    conditionally uniform given the texel), so the realized density is
    EXACTLY what pdf() reports."""
    h, w = scene.env_texel_p.shape
    row, fr = _pick(scene.env_row_cdf, u1)                # [R]
    col_cdf_rows = scene.env_col_cdf[row]                 # [R,W]
    col, fc = _pick(col_cdf_rows, u2)
    v = (row.astype(jnp.float32) + fr) / h
    u = (col.astype(jnp.float32) + fc) / w
    return dir_from_uv(u, v)


def pdf(scene, direction: jnp.ndarray) -> jnp.ndarray:
    """[R] solid-angle pdf of ``sample`` for the given directions.

    Density of a texel sampled with probability P, uniform in (u, v):
    P * H * W / (2 pi^2 sin(theta)) — with sin at the ACTUAL direction,
    since dOmega = 2 pi^2 sin(theta) du dv / (H W) varies within a texel."""
    from cpu_ray_tracing_implementation_tpu.ops import intersect as isect

    h, w = scene.env_texel_p.shape
    u, v = isect.sphere_uv(vm.normalize(direction))
    j = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    i = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    sin_t = jnp.maximum(jnp.sin(PI * v), 1e-4)
    return scene.env_texel_p[j, i] * (h * w) / (2.0 * PI * PI * sin_t)
