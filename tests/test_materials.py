"""Tests for the masked-lane material dispatch (reference semantics:
src/material.h, src/pdf.h, the estimator in src/camera.h:202-240)."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import intersect as isect
from cpu_ray_tracing_implementation_tpu.ops import materials as mat_ops
from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm


def _scene_one_sphere(mat_fn):
    b = SceneBuilder()
    mat_fn(b)
    return b.build()


def _hit_sphere(scene, org=(0, 0, 0), d=(0, 0, -1)):
    o = jnp.array([org], jnp.float32)
    dd = jnp.array([d], jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    u_vol = jnp.full((1, scene.n_volumes), 0.5)
    return o, dd, isect.intersect_brute(scene, o, dd, t, 1e-3, u_vol)


def _uniform_block(n, scene, fill=0.5):
    return jnp.full((n, mat_ops.NSLOT + scene.n_volumes), fill)


def test_lambertian_weight_is_albedo_no_lights():
    """With no registered light, pdf == p_scattered (cosine/pi both), so the
    weight collapses to the albedo exactly (src/camera.h:217-226)."""
    s = _scene_one_sphere(lambda b: b.sphere((0, 0, -5), 1.0, b.lambertian((0.25, 0.5, 0.75))))
    o, d, hit = _hit_sphere(s)
    new_dir, weight, cont = mat_ops.scatter(s, hit, d, _uniform_block(1, s))
    assert bool(cont[0])
    np.testing.assert_allclose(weight[0], [0.25, 0.5, 0.75], rtol=1e-4)
    # scattered direction in the hemisphere of the normal
    assert float(vm.dot(new_dir, hit.normal)[0]) > 0.0


def test_metal_mirror_direction():
    s = _scene_one_sphere(lambda b: b.sphere((0, 0, -5), 1.0, b.metal((0.9, 0.8, 0.7), 0.0)))
    o, d, hit = _hit_sphere(s, org=(0.5, 0, 0), d=(0, 0, -1))
    new_dir, weight, cont = mat_ops.scatter(s, hit, d, _uniform_block(1, s))
    assert bool(cont[0])
    np.testing.assert_allclose(weight[0], [0.9, 0.8, 0.7], rtol=1e-5)
    # perfect mirror: reflect(d, n) with zero fuzz
    expect = vm.reflect(vm.normalize(d), hit.normal)
    np.testing.assert_allclose(np.asarray(vm.normalize(new_dir))[0],
                               np.asarray(vm.normalize(expect))[0], atol=1e-5)


def test_dielectric_total_internal_reflection():
    """Grazing exit from inside glass: ri*sin > 1 forces reflection
    (src/material.h:121-127)."""
    b = SceneBuilder()
    b.sphere((0, 0, 0), 2.0, b.dielectric(1.5))
    s = b.build()
    # start inside near the top edge going +x: exit incidence is ~72 deg off
    # the surface normal, so sin_theta * 1.5 > 1 -> total internal reflection
    org = (0.0, 1.9, 0.0)
    d = (1.0, 0.0, 0.0)
    o, dd, hit = _hit_sphere(s, org=org, d=d)
    assert not bool(hit.front[0])
    # u decision = 1.0 would always refract if allowed; TIR must still reflect
    u = _uniform_block(1, s).at[:, mat_ops.SLOT_DECISION].set(0.9999)
    new_dir, weight, cont = mat_ops.scatter(s, hit, dd, u)
    assert bool(cont[0])
    cos_out = float(vm.dot(vm.normalize(new_dir), hit.normal)[0])
    # reflected ray stays on the inside (same side as the face-forward normal)
    assert cos_out > 0.0


def test_dielectric_refracts_head_on():
    b = SceneBuilder()
    b.sphere((0, 0, -5), 1.0, b.dielectric(1.5))
    s = b.build()
    o, d, hit = _hit_sphere(s)
    u = _uniform_block(1, s).at[:, mat_ops.SLOT_DECISION].set(0.9999)  # > schlick(1,1/1.5)
    new_dir, weight, cont = mat_ops.scatter(s, hit, d, u)
    np.testing.assert_allclose(np.asarray(new_dir)[0], [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(weight[0], [1, 1, 1], rtol=1e-5)


def test_emission_front_face_only():
    b = SceneBuilder()
    b.quad((-1, -1, -3), (2, 0, 0), (0, 2, 0), b.diffuse_light((5, 6, 7)))
    s = b.build()
    o, d, hit = _hit_sphere(s)  # ray along -z; quad normal = +z -> front face
    emit = mat_ops.emitted(s, hit)
    np.testing.assert_allclose(emit[0], [5, 6, 7], rtol=1e-5)
    o, d, hit_back = _hit_sphere(s, org=(0, 0, -6), d=(0, 0, 1))
    emit_back = mat_ops.emitted(s, hit_back)
    np.testing.assert_allclose(emit_back[0], [0, 0, 0], atol=1e-7)
    # lights terminate the path (src/material.h:43 default scatter = false)
    _, _, cont = mat_ops.scatter(s, hit, d, _uniform_block(1, s))
    assert not bool(cont[0])


def test_isotropic_weight_unbiased():
    """isotropic: p_scat = pdf = 1/4pi -> weight = albedo (no lights)."""
    b = SceneBuilder()
    b.volume_sphere((0, 0, -5), 1.0, 1e5, (0.3, 0.6, 0.9))
    s = b.build()
    o = jnp.array([[0, 0, 0]], jnp.float32)
    d = jnp.array([[0, 0, -1]], jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    hit = isect.intersect_brute(s, o, d, t, 1e-3, jnp.full((1, s.n_volumes), 0.5))
    assert bool(hit.valid[0])
    new_dir, weight, cont = mat_ops.scatter(s, hit, d, _uniform_block(1, s))
    assert bool(cont[0])
    np.testing.assert_allclose(weight[0], [0.3, 0.6, 0.9], rtol=1e-4)


def test_light_pdf_analytic():
    """dist^2/(cos*area) for a unit quad seen head-on from distance 2
    (src/quad.h:66-73)."""
    b = SceneBuilder()
    q = b.quad((-0.5, -0.5, -2), (1, 0, 0), (0, 1, 0), b.diffuse_light((1, 1, 1)))
    b.light(q)
    s = b.build()
    origin = jnp.array([[0.0, 0.0, 0.0]])
    direction = jnp.array([[0.0, 0.0, -1.0]])
    pdf = mat_ops.light_pdf(s, origin, direction)
    np.testing.assert_allclose(pdf[0], 4.0, rtol=1e-4)  # 2^2 / (1 * 1)


def test_gloss_smooth_specular_is_mirror():
    """smoothness=1 specular lobe = pure reflect (src/material.h:158-166)."""
    s = _scene_one_sphere(lambda b: b.sphere((0, 0, -5), 1.0, b.gloss((1, 1, 1), 1.0, 1.0)))
    o, d, hit = _hit_sphere(s, org=(0.3, 0, 0))
    u = _uniform_block(1, s).at[:, mat_ops.SLOT_DECISION].set(0.0)  # specular branch
    new_dir, weight, cont = mat_ops.scatter(s, hit, d, u)
    expect = vm.normalize(vm.reflect(d, hit.normal))
    np.testing.assert_allclose(np.asarray(new_dir)[0], np.asarray(expect)[0], atol=1e-5)
    np.testing.assert_allclose(weight[0], [1, 1, 1], rtol=1e-5)  # spec weight = 1
