"""Every scene in the 22-scene catalog builds and renders finite pixels at a
tiny size — the reference's de-facto regression matrix (SURVEY.md §2.2)."""

import jax
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, integrator

ALL_SCENES = sorted(catalog.SCENES)


def test_catalog_has_all_22_scenes():
    """All 22 reference scenes (main.cc:634-657) plus catalog extensions."""
    ref_scenes = 22
    extensions = {"cornell_box_with_sphere_light", "textured_fox",
                  "dispersion_prism", "sunlit_spheres", "smoke_fox"}
    assert len(catalog.SCENES) == ref_scenes + len(extensions)
    assert extensions <= set(catalog.SCENES)


@pytest.mark.parametrize("name", ALL_SCENES)
def test_scene_builds_and_renders(name):
    scene, cam = catalog.SCENES[name](width=12, spp=2, max_depth=3)
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(0)))
    assert img.shape[-1] == 3 and img.shape[0] >= 1
    assert np.isfinite(img).all(), f"{name} produced non-finite pixels"
    assert (img >= 0).all(), f"{name} produced negative radiance"
