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


def test_wavefront_checkpoint_resume_identical(tmp_path):
    """Checkpointed wavefront accumulation (render_wavefront sample_offset,
    round 5): interrupted + resumed == uninterrupted exactly, and the
    final image matches the single-shot wavefront render."""
    import numpy as np

    from cpu_ray_tracing_implementation_tpu.models import catalog, integrator
    from cpu_ray_tracing_implementation_tpu.utils import checkpoint as ck

    scene, cam = catalog.sphereflake(width=12, spp=6, max_depth=2,
                                     depth_levels=2)
    path = str(tmp_path / "wf.ckpt")

    # uninterrupted
    a = np.asarray(ck.render_with_checkpoint(scene, cam, seed=3, chunk_spp=2,
                                             ckpt_path=None, log=lambda *_: 0,
                                             use_wavefront=True))
    # interrupted after one chunk: run with a log hook that raises
    calls = []

    def bomb(msg):
        calls.append(msg)
        if len(calls) == 1 and "[render]" in msg:
            raise KeyboardInterrupt

    try:
        ck.render_with_checkpoint(scene, cam, seed=3, chunk_spp=2,
                                  ckpt_path=path, log=bomb,
                                  use_wavefront=True)
    except KeyboardInterrupt:
        pass
    b = np.asarray(ck.render_with_checkpoint(scene, cam, seed=3, chunk_spp=2,
                                             ckpt_path=path,
                                             log=lambda *_: 0,
                                             use_wavefront=True))
    np.testing.assert_array_equal(a, b)  # resume == uninterrupted, bitwise

    # a scan-made checkpoint must be refused under the wavefront (different
    # fingerprint), not blended
    import jax

    full = np.asarray(integrator.render_image_wavefront(scene, cam,
                                                        jax.random.key(3)))
    np.testing.assert_allclose(a, full, rtol=1e-5, atol=1e-6)


def test_sharded_checkpoint_interoperates_with_single_chip(tmp_path):
    """Sharded chunk sums are bitwise the single-chip ones, so a
    checkpoint written sharded resumes single-chip (and vice versa) with
    the final image equal to the uninterrupted single-chip render."""
    import numpy as np

    from cpu_ray_tracing_implementation_tpu.models import catalog
    from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm
    from cpu_ray_tracing_implementation_tpu.utils import checkpoint as ck

    scene, cam = catalog.cornell_box(width=10, spp=4, max_depth=2)
    mesh = pm.make_mesh()

    a = np.asarray(ck.render_with_checkpoint(scene, cam, seed=1, chunk_spp=2,
                                             ckpt_path=None,
                                             log=lambda *_: 0))
    b = np.asarray(ck.render_with_checkpoint(scene, cam, seed=1, chunk_spp=2,
                                             ckpt_path=None, mesh=mesh,
                                             log=lambda *_: 0))
    np.testing.assert_array_equal(a, b)

    # write one sharded chunk, resume single-chip
    path = str(tmp_path / "mix.ckpt")
    calls = []

    def bomb(msg):
        calls.append(msg)
        if len(calls) == 1 and "[render]" in msg:
            raise KeyboardInterrupt

    try:
        ck.render_with_checkpoint(scene, cam, seed=1, chunk_spp=2,
                                  ckpt_path=path, mesh=mesh, log=bomb)
    except KeyboardInterrupt:
        pass
    c = np.asarray(ck.render_with_checkpoint(scene, cam, seed=1, chunk_spp=2,
                                             ckpt_path=path,
                                             log=lambda *_: 0))
    np.testing.assert_array_equal(a, c)


def test_sharded_wavefront_checkpoint_matches_single_chip(tmp_path):
    """Sharded WAVEFRONT chunk sums (mesh.accumulate_wavefront_sharded)
    are bitwise the single-chip wavefront chunks — the triple
    --checkpoint --sharded --wavefront composes end to end."""
    import numpy as np

    from cpu_ray_tracing_implementation_tpu.models import catalog
    from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm
    from cpu_ray_tracing_implementation_tpu.utils import checkpoint as ck

    scene, cam = catalog.sphereflake(width=10, spp=4, max_depth=2,
                                     depth_levels=2)
    a = np.asarray(ck.render_with_checkpoint(scene, cam, seed=2, chunk_spp=2,
                                             ckpt_path=None,
                                             use_wavefront=True,
                                             log=lambda *_: 0))
    b = np.asarray(ck.render_with_checkpoint(scene, cam, seed=2, chunk_spp=2,
                                             ckpt_path=None,
                                             use_wavefront=True,
                                             mesh=pm.make_mesh(),
                                             log=lambda *_: 0))
    np.testing.assert_array_equal(a, b)
