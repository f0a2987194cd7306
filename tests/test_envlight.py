"""Environment-light importance sampling (ops/envlight.py).

A small bright "sun" patch on a dark sky is the motivating case: BSDF-only
sampling finds it by luck; env MIS finds it by construction. Tests check
the direction<->uv inversion, that pdf() is the true density of sample()
(chi-square on texel counts + integral == 1), and the estimator-level
payoff: same mean, much lower variance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator
from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import envlight
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm


def _sun_scene(importance: bool, env_res=(32, 64)):
    """Dark sky with a bright sun patch; a diffuse floor sphere."""
    sky = np.full((16, 32, 3), 4.0, np.float32)        # dim byte-scale sky
    sky[4:6, 10:13] = 255.0                            # the sun
    b = SceneBuilder()
    b.sphere((0, -100.5, -1), 100.0, b.lambertian((0.8, 0.8, 0.8)))
    b.sphere((0, 0, -1), 0.5, b.lambertian((0.6, 0.3, 0.2)))
    b.set_background(b.picture(sky), importance_sample=importance,
                     env_res=env_res)
    return b.build()


def test_dir_from_uv_inverts_sphere_uv():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    u, v = isect.sphere_uv(jnp.asarray(d))
    back = np.asarray(envlight.dir_from_uv(u, v))
    np.testing.assert_allclose(back, d, atol=2e-5)


def test_pdf_integrates_to_one():
    scene = _sun_scene(True)
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200_000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = np.asarray(envlight.pdf(scene, jnp.asarray(d)))
    integral = p.mean() * 4.0 * np.pi
    np.testing.assert_allclose(integral, 1.0, rtol=0.05)


def test_sample_density_matches_pdf():
    """Empirical texel frequencies of sample() match the tabulated texel
    probabilities (the pdf IS the sampler's density)."""
    scene = _sun_scene(True, env_res=(16, 32))
    h, w = scene.env_texel_p.shape
    n = 400_000
    key = jax.random.key(0)
    u = jax.random.uniform(key, (2, n))
    dirs = envlight.sample(scene, u[0], u[1])
    uu, vv = isect.sphere_uv(vm.normalize(dirs))
    j = np.clip((np.asarray(vv) * h).astype(int), 0, h - 1)
    i = np.clip((np.asarray(uu) * w).astype(int), 0, w - 1)
    counts = np.zeros((h, w))
    np.add.at(counts, (j, i), 1.0)
    emp = counts / n
    p_texel = np.asarray(scene.env_texel_p)
    # sun texels (high mass): tight relative agreement; everywhere else a
    # 5-sigma Poisson bound (low-mass texels see ~60 counts here)
    sun = p_texel > 0.01
    assert sun.any() and p_texel.max() > 0.05
    np.testing.assert_allclose(emp[sun], p_texel[sun], rtol=0.05)
    sigma = np.sqrt(p_texel * (1 - p_texel) / n)
    assert (np.abs(emp - p_texel) < 5 * sigma + 1e-6).all()


def test_env_mis_same_mean_lower_variance():
    """Renders with and without env importance sampling agree in the mean
    (unbiased) and env MIS cuts the per-run variance by >=3x."""
    scene_mis = _sun_scene(True)
    scene_plain = _sun_scene(False)
    assert scene_mis.has_env_light and scene_mis.has_lights
    assert not scene_plain.has_env_light and not scene_plain.has_lights
    b = SceneBuilder()  # camera shared
    from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod

    cam = cam_mod.perspective(24, 1.5, (0, 0.3, 1), (0, 0, -1), 1, 60.0,
                              16, 3)

    imgs_mis, imgs_plain = [], []
    for k in range(6):
        key = jax.random.key(k)
        imgs_mis.append(np.asarray(
            integrator.render_image(scene_mis, cam, key, spp=16)))
        imgs_plain.append(np.asarray(
            integrator.render_image(scene_plain, cam, key, spp=16)))
    mis = np.stack(imgs_mis)
    plain = np.stack(imgs_plain)
    # unbiasedness: the grand (image-aggregate) means agree — per-pixel
    # agreement is unobservable here because the PLAIN estimator's noise
    # at 16 spp x 6 runs dwarfs it (that's the point of the feature)
    assert abs(mis.mean() - plain.mean()) / (plain.mean() + 1e-4) < 0.08
    # variance: per-pixel across runs, averaged (measured ~14x win)
    v_mis = mis.var(0).mean()
    v_plain = plain.var(0).mean()
    assert v_mis < v_plain / 3.0, (v_mis, v_plain)


def test_reference_scenes_unaffected():
    """Scenes without importance_sample keep env tables off (static graph
    identical to before the feature existed)."""
    scene, _ = catalog.cornell_box(width=8, spp=1, max_depth=2)
    assert scene.env_texel_p is None and not scene.has_env_light
    scene2, _ = catalog.skybox_and_fisheye(width=8, spp=1, max_depth=2)
    assert scene2.env_texel_p is None
