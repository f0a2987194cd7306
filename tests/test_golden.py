"""Golden radiometric regression: mean radiance of every catalog scene at a
tiny fixed workload (16px, 4spp, depth 3, key 42, CPU backend) must stay
within Monte-Carlo-noise distance of the recorded value.

These pins catch silent estimator/brightness regressions that structural
tests miss (e.g. an estimator-weight bug shifts every mean). Regenerate
deliberately if the estimator changes:

    python - <<'PY'
    import jax; jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    from cpu_ray_tracing_implementation_tpu.models import catalog, integrator
    for n in sorted(catalog.SCENES):
        s, c = catalog.SCENES[n](width=16, spp=4, max_depth=3)
        print(n, np.asarray(integrator.render_image(s, c, jax.random.key(42))).mean())
    PY
"""

import jax
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator

# recorded 2026-08-17 (round 2, CRT_RNG=fast + CRT_COSINE=sphere defaults)
GOLDEN_MEANS = {
    "cornell_box": 0.160999,
    "cornell_box_with_glossy_ball": 0.283795,
    "cornell_box_with_rotated_box": 0.535078,
    "cornell_box_with_specular_box": 0.488185,
    "cornell_box_with_sphere_light": 0.427467,
    "cornell_box_with_volume": 0.487237,
    "different_fuzz_metal": 0.322772,
    "glass_fox": 0.611855,
    "infinite_reflection": 0.335842,
    "perlin_texture_ball": 0.418168,
    "random_motion_ball": 0.426140,
    "simple_light_earth": 0.037078,
    "skybox_and_fisheye": 0.633859,
    "skybox_and_motion_blur": 0.630457,
    "sphereflake": 0.592463,
    # sponza: procedural colonnade substitute (Sponza.bin absent)
    "sponza": 0.402695,
    "test_perlin_noise": 0.507109,
    "test_value_noise": 0.496078,
    "test_voronoi_noise": 0.462877,
    "test_worley_noise": 0.322421,
    "textured_fox": 0.620839,
    "dispersion_prism": 0.782510,  # recorded 2026-08-18 (spectral mode)
    "sunlit_spheres": 0.090164,    # recorded 2026-08-18 (env MIS)
    "smoke_fox": 0.417005,         # recorded 2026-08-20 (VOL_MESH)
    "three_material_ball": 0.563181,
    "three_material_ball_with_defocus_blur": 0.605853,
    "white_sphere": 1.000000,
}


@pytest.mark.parametrize("name", sorted(GOLDEN_MEANS))
def test_golden_mean(name):
    scene, cam = catalog.SCENES[name](width=16, spp=4, max_depth=3)
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(42)))
    expect = GOLDEN_MEANS[name]
    # identical key/workload: exact up to cross-platform fp reassociation
    np.testing.assert_allclose(img.mean(), expect, atol=2e-3)
