"""Checkpoint/resume tests: interrupted + resumed render must be bitwise
identical to an uninterrupted one (SURVEY.md §5 checkpoint design)."""

import os

import jax
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator
from cpu_ray_tracing_implementation_tpu.utils import checkpoint as ckpt


def test_chunked_accumulation_matches_single_shot():
    scene, cam = catalog.cornell_box(width=12, spp=8, max_depth=3)
    single = np.asarray(integrator.render_image(scene, cam, jax.random.key(5), spp=8))
    a = np.asarray(integrator.accumulate_samples(scene, cam, jax.random.key(5), 0, 3))
    b = np.asarray(integrator.accumulate_samples(scene, cam, jax.random.key(5), 3, 5))
    chunked = ((a + b) / 8).reshape(cam.height, cam.width, 3)
    np.testing.assert_allclose(single, chunked, atol=1e-6)


def test_resume_after_interrupt(tmp_path):
    scene, cam = catalog.cornell_box(width=12, spp=8, max_depth=3)
    path = str(tmp_path / "r.ckpt")

    logs = []
    # phase 1: render half, "crash" (stop calling)
    fp = ckpt._fingerprint(scene, cam, seed=5)
    part = np.asarray(integrator.accumulate_samples(scene, cam, jax.random.key(5), 0, 4))
    ckpt.save(path, part, 4, fp)

    # phase 2: resume to completion
    img = ckpt.render_with_checkpoint(scene, cam, seed=5, spp=8, chunk_spp=2,
                                      ckpt_path=path, log=logs.append)
    assert any("resuming at 4/8" in l for l in logs)
    assert not os.path.exists(path)  # spent checkpoint removed

    single = np.asarray(integrator.render_image(scene, cam, jax.random.key(5), spp=8))
    np.testing.assert_allclose(np.asarray(img), single, atol=1e-6)


def test_mismatched_config_refused(tmp_path):
    scene, cam = catalog.cornell_box(width=12, spp=4, max_depth=3)
    other_scene, other_cam = catalog.white_sphere(width=12, spp=4, max_depth=3)
    path = str(tmp_path / "r.ckpt")
    fp_other = ckpt._fingerprint(other_scene, other_cam, seed=0)
    ckpt.save(path, np.zeros((144, 3), np.float32), 2, fp_other)
    assert ckpt.load(path, ckpt._fingerprint(scene, cam, seed=0)) is None
