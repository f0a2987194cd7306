"""Arbitrary output variables (AOVs): first-hit feature buffers.

Beyond-parity extension (the reference renders beauty only,
src/camera.h:146-171): one extra cheap pass records, per pixel, the first
camera hit's geometric features averaged over spp —

- ``normal``   [H,W,3] mean face-forward shading normal (re-normalized)
- ``albedo``   [H,W,3] mean base color (the hit material's texture)
- ``depth``    [H,W,1] mean hit distance t (0 where nothing was hit)
- ``coverage`` [H,W,1] fraction of samples that hit anything

These are the guidance buffers for the edge-avoiding denoiser
(utils/denoise.py) and standard inputs to any external denoiser. Raygen
reuses the beauty pass's per-(pixel, sample) RNG streams
(models/integrator.py render_sample), so the buffers are anti-aliased by
the same camera jitter / defocus / motion-time draws as the beauty image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod
from cpu_ray_tracing_implementation_tpu.models import integrator
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import materials as mat_ops
from cpu_ray_tracing_implementation_tpu.ops import tables as tbl
from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm
from cpu_ray_tracing_implementation_tpu.ops.textures import eval_texture


def _first_hit(scene, camera, key, pixel_ids, sample_idx, qmc_words=None):
    """One sample's first-hit features, mirroring render_sample's raygen
    and bounce-0 uniform draws (so volume boundaries are sampled with the
    beauty pass's stream) — including the Owen-Sobol stream when
    camera.qmc is set, so guide buffers stay aligned with the beauty
    samples' sub-pixel positions."""
    from cpu_ray_tracing_implementation_tpu.ops import qmc

    nslot = mat_ops.NSLOT + scene.n_volumes
    k_cam, k_path = jax.random.split(key)
    if camera.qmc:
        u_cam = qmc.uniforms(qmc_words, pixel_ids, sample_idx, 0,
                             qmc.CAM_GROUP, qmc.CAM_DIM)
        b_groups, b_dims, _ = qmc.bounce_layout(nslot)
        u = qmc.uniforms(qmc_words, pixel_ids, sample_idx,
                         qmc.N_CAM_GROUPS, b_groups, b_dims)
    else:
        u_cam = integrator._per_ray_uniforms(k_cam, pixel_ids,
                                             cam_mod.N_CAM_SLOTS)
        u_cam = cam_mod.stratify_pixel_jitter(camera, u_cam, sample_idx)
        u = integrator._per_ray_uniforms(jax.random.fold_in(k_path, 0),
                                         pixel_ids, nslot)
    org, dirs, time = cam_mod.generate_rays(camera, pixel_ids, u_cam)
    if scene.world_offset is not None:
        org = org - scene.world_offset[None, :]
    alive = jnp.ones(pixel_ids.shape, bool)
    hit = isect.intersect_brute(scene, org, dirs, time, integrator.T_MIN,
                                u[:, mat_ops.SLOT_VOLUME0:], active=alive)

    n_m = scene.materials.mtype.shape[0]
    oh = tbl.onehot(hit.mat, n_m) if n_m <= tbl.MAX_ONEHOT else None
    tex_id = tbl.take_rows(scene.materials.tex, hit.mat, oh)
    albedo = eval_texture(scene, tex_id, hit.u, hit.v, hit.p)

    v = hit.valid
    return (jnp.where(v[:, None], hit.normal, 0.0),
            jnp.where(v[:, None], albedo, 0.0),
            jnp.where(v, hit.t, 0.0),
            v.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("spp",))
def render_aovs(scene, camera, key, spp: int | None = None) -> dict:
    """Feature buffers dict, averaged over ``spp`` camera samples."""
    spp = camera.spp if spp is None else spp
    n_pix = camera.width * camera.height
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    if camera.qmc:
        from cpu_ray_tracing_implementation_tpu.ops import qmc

        qmc_words = qmc.seed_words(key)
    else:
        qmc_words = None

    def one_sample(acc, s):
        k = jax.random.fold_in(key, s)
        n, a, d, c = _first_hit(scene, camera, k, pixel_ids, s,
                                qmc_words=qmc_words)
        return (acc[0] + n, acc[1] + a, acc[2] + d, acc[3] + c), None

    zeros3 = jnp.zeros((n_pix, 3), jnp.float32)
    zeros1 = jnp.zeros((n_pix,), jnp.float32)
    (n, a, d, c), _ = jax.lax.scan(one_sample, (zeros3, zeros3, zeros1,
                                                zeros1), jnp.arange(spp))

    # per-pixel mean over the samples that hit (miss samples contribute 0)
    denom = jnp.maximum(c, 1.0)
    normal = vm.normalize(n / denom[:, None])
    normal = jnp.where((c > 0)[:, None], normal, 0.0)
    h, w = camera.height, camera.width
    return {
        "normal": normal.reshape(h, w, 3),
        "albedo": (a / denom[:, None]).reshape(h, w, 3),
        "depth": (d / denom).reshape(h, w, 1),
        "coverage": (c / spp).reshape(h, w, 1),
    }
