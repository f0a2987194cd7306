"""Batched texture evaluation over flat texture tables.

Replaces the reference's virtual ``texture::sample(u, v, p)`` dispatch
(src/texture.h:9) with masked-lane evaluation: parameters are gathered by
texture id and every texture *type the scene actually uses* is evaluated for
all lanes, then selected by type code. The set of used types is a static
scene attribute, so unused branches never enter the XLA graph.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.ops import noise as noise_ops
from cpu_ray_tracing_implementation_tpu.ops import tables as tbl
from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod


def eval_texture(scene, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                 p: jnp.ndarray) -> jnp.ndarray:
    """color [R,3] for per-lane texture ids at (u, v, p).

    ``p`` arrives in the (possibly recentered) tracing frame; position-based
    textures evaluate in true world space by adding Scene.world_offset back,
    so recentering never changes a rendered image.
    """
    if scene.world_offset is not None:
        p = p + scene.world_offset[None, :]
    texs = scene.textures
    n_t = texs.ttype.shape[0]
    oh = tbl.onehot(tex_id, n_t) if n_t <= tbl.MAX_ONEHOT else None
    ttype = tbl.take_rows(texs.ttype, tex_id, oh)    # [R]
    color0 = tbl.take_rows(texs.color0, tex_id, oh)  # [R,3]
    color1 = tbl.take_rows(texs.color1, tex_id, oh)
    scale = tbl.take_rows(texs.scale, tex_id, oh)
    used = scene.tex_types_used or (scene_mod.TEX_SOLID,)

    out = color0  # TEX_SOLID result doubles as the base case

    if scene_mod.TEX_CHECKER in used:
        # 3-D position checker (src/texture.h:47-56): parity of floor(p/scale)
        uvw = p / scale[..., None]
        ixyz = jnp.floor(uvw).astype(jnp.int32)
        total = ixyz[..., 0] + ixyz[..., 1] + ixyz[..., 2]
        checker = jnp.where((jnp.mod(total, 2) == 0)[..., None], color0, color1)
        out = jnp.where((ttype == scene_mod.TEX_CHECKER)[..., None], checker, out)

    if scene_mod.TEX_PICTURE in used:
        # nearest texel, v flipped, /256 (src/texture.h:68-74); opt-in
        # bilinear 4-tap (Textures.tfilter == 1), statically gated
        image_id = tbl.take_rows(texs.image_id, tex_id, oh)
        pic = jnp.zeros_like(color0)
        if scene.has_bilinear:
            tfil = tbl.take_rows(texs.tfilter, tex_id, oh)
        for k, img in enumerate(scene.images):
            h, w = img.shape[0], img.shape[1]
            i = jnp.clip((w * u).astype(jnp.int32), 0, w - 1)
            j = jnp.clip((h * (1.0 - v)).astype(jnp.int32), 0, h - 1)
            texel = img[j, i] * (1.0 / 256.0)
            if scene.has_bilinear:
                x = w * u - 0.5
                y = h * (1.0 - v) - 0.5
                x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
                y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
                x1 = jnp.minimum(x0 + 1, w - 1)
                y1 = jnp.minimum(y0 + 1, h - 1)
                fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
                fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
                lerped = ((img[y0, x0] * (1 - fx) + img[y0, x1] * fx)
                          * (1 - fy)
                          + (img[y1, x0] * (1 - fx) + img[y1, x1] * fx)
                          * fy) * (1.0 / 256.0)
                texel = jnp.where((tfil == 1)[..., None], lerped, texel)
            pic = jnp.where((image_id == k)[..., None], texel, pic)
        out = jnp.where((ttype == scene_mod.TEX_PICTURE)[..., None], pic, out)

    if scene_mod.TEX_PERLIN in used:
        # marble: .5*(1+sin(x + 70*turb7(p/scale))) (src/texture.h:85-88)
        turb = noise_ops.perlin_turb(p / scale[..., None],
                                     scene.noise.perlin_grad, scene.noise.perlin_perm, depth=7)
        marble = 0.5 * (1.0 + jnp.sin(p[..., 0] + 70.0 * turb))
        out = jnp.where((ttype == scene_mod.TEX_PERLIN)[..., None], marble[..., None], out)

    if scene_mod.TEX_VALUE in used:
        val = noise_ops.value_noise(p, scene.noise.value_grid)
        out = jnp.where((ttype == scene_mod.TEX_VALUE)[..., None], val[..., None], out)

    if scene_mod.TEX_WORLEY in used:
        val = noise_ops.worley_noise(p)
        out = jnp.where((ttype == scene_mod.TEX_WORLEY)[..., None], val[..., None], out)

    if scene_mod.TEX_VORONOI in used:
        val = noise_ops.voronoi_noise(p)
        out = jnp.where((ttype == scene_mod.TEX_VORONOI)[..., None], val[..., None], out)

    return out
