"""fit_scene optimizer options + training-state checkpoint/resume."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, diff, integrator
import jax


def _toy():
    """Tiny fit problem: recover a wall albedo from a target render."""
    scene, cam = catalog.cornell_box(width=8, spp=2, max_depth=2)
    target = np.asarray(integrator.render_image(scene, cam,
                                                jax.random.key(7), spp=8))
    # perturb the first texture row's color
    wrong = scene.replace(textures=scene.textures.replace(
        color0=scene.textures.color0.at[1].set(jnp.array([0.9, 0.1, 0.1]))))
    return wrong, cam, jnp.asarray(target)


def test_resume_equals_uninterrupted(tmp_path):
    wrong, cam, target = _toy()
    full_scene, full_losses = diff.fit_scene(
        wrong, cam, target, steps=6, lr=0.3, spp=2, seed=1)

    ck = str(tmp_path / "fit.npz")
    diff.fit_scene(wrong, cam, target, steps=3, lr=0.3, spp=2, seed=1,
                   checkpoint_path=ck, checkpoint_every=3)
    res_scene, res_losses = diff.fit_scene(
        wrong, cam, target, steps=6, lr=0.3, spp=2, seed=1,
        checkpoint_path=ck, checkpoint_every=3)

    np.testing.assert_allclose(res_losses, full_losses, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res_scene.textures.color0),
        np.asarray(full_scene.textures.color0))


def test_resume_refuses_mismatched_config(tmp_path):
    wrong, cam, target = _toy()
    ck = str(tmp_path / "fit.npz")
    diff.fit_scene(wrong, cam, target, steps=2, lr=0.3, spp=2, seed=1,
                   checkpoint_path=ck, checkpoint_every=1)
    with pytest.raises(ValueError, match="fingerprint"):
        diff.fit_scene(wrong, cam, target, steps=4, lr=0.9, spp=2, seed=1,
                       checkpoint_path=ck)


def test_adam_optimizer_recovers_albedo(tmp_path):
    """Adam moves the perturbed texture row back toward the true albedo.
    (Asserted on parameter distance — the per-step loss at low spp is
    dominated by direct-light firefly noise and is not a stable signal.)"""
    scene, cam = catalog.cornell_box(width=8, spp=2, max_depth=2)
    true_row = np.asarray(scene.textures.color0[1])
    wrong, cam, target = _toy()
    start_err = np.abs(np.asarray(wrong.textures.color0[1]) - true_row).sum()
    mask = np.zeros_like(np.asarray(wrong.textures.color0))
    mask[1] = 1.0
    fit, _ = diff.fit_scene(wrong, cam, target, steps=22, lr=0.02, spp=4,
                            seed=0, optimizer="adam",
                            param_filter={"tex_color0"},
                            grad_mask={"tex_color0": jnp.asarray(mask)})
    end_err = np.abs(np.asarray(fit.textures.color0[1]) - true_row).sum()
    # adam's v-hat normalization attenuates steps under noisy MC grads, so
    # demand steady progress, not full recovery (measured ~0.65x)
    assert end_err < 0.8 * start_err, (start_err, end_err)
    # frozen rows untouched
    np.testing.assert_array_equal(
        np.asarray(fit.textures.color0[2:]),
        np.asarray(wrong.textures.color0[2:]))


def test_adam_resume_restores_moments(tmp_path):
    """Adam state (mu/nu/count) round-trips through the checkpoint: the
    resumed run equals the uninterrupted one exactly."""
    wrong, cam, target = _toy()
    full_scene, full_losses = diff.fit_scene(
        wrong, cam, target, steps=6, lr=0.05, spp=2, seed=2,
        optimizer="adam")
    ck = str(tmp_path / "adam.npz")
    diff.fit_scene(wrong, cam, target, steps=3, lr=0.05, spp=2, seed=2,
                   optimizer="adam", checkpoint_path=ck, checkpoint_every=3)
    res_scene, res_losses = diff.fit_scene(
        wrong, cam, target, steps=6, lr=0.05, spp=2, seed=2,
        optimizer="adam", checkpoint_path=ck, checkpoint_every=3)
    np.testing.assert_allclose(res_losses, full_losses, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res_scene.textures.color0),
        np.asarray(full_scene.textures.color0))
