"""Checkpoint / resume for long renders.

The reference has none (SURVEY.md §5: the image lives in RAM and is written
once at the end, src/camera.h:174,328 — a crash loses everything). The
wavefront design makes checkpointing natural: rendering is spp-chunked
accumulation, so the durable state is just (radiance sum, samples done) plus
the base seed. Because every sample is keyed by its global sample index
(integrator.accumulate_samples), a resumed render draws the identical sample
set as an uninterrupted one (equal up to f32 summation order across chunk
boundaries — ~1 ulp per chunk).

Checkpoints are .npz files written atomically (tmp + rename) with a config
fingerprint; a mismatched fingerprint (different scene/camera/seed) is
refused rather than silently blended.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import jax
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import integrator


def _fingerprint(scene, camera, seed: int) -> str:
    """Cheap structural hash of the render config: scene AND camera pytree
    leaves (pose/optics included — a resumed render with a moved camera must
    be refused, not blended), camera statics, seed."""
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(scene) + jax.tree.leaves(camera):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a.astype(np.float64, copy=False)
                                      if a.dtype != bool else a).tobytes()[:4096])
    h.update(json.dumps([camera.mode, camera.width, camera.height,
                         camera.max_depth, seed]).encode())
    return h.hexdigest()[:16]


def save(path: str, accum: np.ndarray, samples_done: int, fingerprint: str):
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, accum=accum, samples_done=samples_done, fingerprint=fingerprint)
    os.replace(tmp, path)


def load(path: str, fingerprint: str):
    """(accum, samples_done) or None if absent/mismatched."""
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path, allow_pickle=False)
        if str(z["fingerprint"]) != fingerprint:
            print(f"[checkpoint] {path} is for a different render config; ignoring")
            return None
        return z["accum"], int(z["samples_done"])
    except Exception as e:  # noqa: BLE001
        print(f"[checkpoint] failed to read {path}: {e}; starting fresh")
        return None


def render_with_checkpoint(scene, camera, seed: int = 0, spp: int | None = None,
                           chunk_spp: int = 16, ckpt_path: str | None = None,
                           log=print, use_wavefront: bool = False,
                           mesh=None, batch_pixels: int | None = None):
    """Render with periodic checkpointing; resumes from ``ckpt_path``.

    Returns the final [H,W,3] image (identical to a single-shot
    ``render_image`` with the same seed/spp).

    ``use_wavefront``: accumulate each spp chunk through the
    path-regeneration wavefront (render_wavefront(sample_offset=), the
    production integrator for chunked scenes) instead of the classic scan.
    Chunk sums stay deterministic so resume == uninterrupted exactly; the
    integrator choice is part of the checkpoint fingerprint — a scan-made
    checkpoint is refused under the wavefront rather than blended (the
    two agree per path, not bitwise per chunk sum).

    ``mesh`` (optional jax.sharding.Mesh): shard each chunk's pixels over
    the mesh (parallel/mesh.accumulate_*_sharded). Chunk sums are BITWISE
    the single-chip ones (per-pixel streams and per-pixel sample order are
    shard-invariant), so sharded and single-chip checkpoints interoperate.

    ``batch_pixels``: override the scan path's auto pixel batching
    (integrator.scan_batch_pixels) — the CLI maps --tile-pixels here; on
    the wavefront path it caps the lane pool instead."""
    spp = camera.spp if spp is None else spp
    key = jax.random.key(seed)
    fp = _fingerprint(scene, camera, seed)
    if use_wavefront:
        fp = "wf-" + fp
    n_pix = camera.width * camera.height

    accum = np.zeros((n_pix, 3), np.float32)
    done = 0
    if ckpt_path:
        state = load(ckpt_path, fp)
        if state is not None:
            accum, done = state
            log(f"[checkpoint] resuming at {done}/{spp} spp from {ckpt_path}")

    lanes = integrator.wavefront_lanes(scene, n_pix) if use_wavefront else None
    if use_wavefront and batch_pixels:
        lanes = min(batch_pixels, lanes or n_pix)
    sharded = mesh is not None and mesh.devices.size > 1
    while done < spp:
        n = min(chunk_spp, spp - done)
        t0 = time.time()
        if sharded:
            from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm

            if use_wavefront:
                part = pm.accumulate_wavefront_sharded(scene, camera, key,
                                                       done, n, mesh)
            else:
                part = pm.accumulate_samples_sharded(scene, camera, key,
                                                     done, n, mesh)
        elif use_wavefront:
            part = integrator.render_wavefront(scene, camera, key, n,
                                               lanes=lanes,
                                               sample_offset=done)
        else:
            part = integrator.accumulate_samples(
                scene, camera, key, done, n,
                unroll=integrator._default_unroll(),
                batch_pixels=(batch_pixels
                              or integrator.scan_batch_pixels(scene)))
        part = np.asarray(part)
        dt = time.time() - t0
        accum = accum + part
        done += n
        log(f"[render] {done}/{spp} spp "
            f"({n_pix * n / dt / 1e6:.2f}M camera rays/s)")
        if ckpt_path:
            save(ckpt_path, accum, done, fp)

    if ckpt_path and os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # complete — the checkpoint is spent
    return (accum / spp).reshape(camera.height, camera.width, 3)
