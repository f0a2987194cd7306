"""NaN hygiene: golden renders under jax_debug_nans (the pure-functional
stand-in for the reference's missing sanitizer runs, SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator


@pytest.mark.parametrize("name", ["cornell_box", "cornell_box_with_volume",
                                  "three_material_ball", "simple_light_earth"])
def test_render_clean_under_debug_nans(name):
    scene, cam = catalog.SCENES[name](width=8, spp=2, max_depth=3)
    with jax.debug_nans(True):
        img = integrator.render_image(scene, cam, jax.random.key(0))
        a = np.asarray(img)
    assert np.isfinite(a).all()
