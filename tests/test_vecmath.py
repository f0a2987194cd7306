"""Unit tests for ops.vecmath (reference semantics: src/vec3.h, src/onb.h,
src/utility.h:70-87)."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm


def test_dot_cross_length():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, -5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(vm.dot(a, b), [12.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(vm.cross(a, b)[1], [0.0, 0.0, -1.0], rtol=1e-6)
    np.testing.assert_allclose(vm.length(a)[1], 1.0, rtol=1e-6)


def test_normalize_unit_and_safe_at_zero():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(vm.length(n)[0], 1.0, rtol=1e-5)
    assert np.isfinite(np.asarray(n)).all()


def test_reflect_mirror():
    """v - 2 dot(v,n) n (src/utility.h:70): 45-degree incidence flips y."""
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vm.reflect(v, n), [[1.0, 1.0, 0.0]], atol=1e-6)


def test_refract_snell():
    """Snell's law at a flat interface (src/utility.h:71-76)."""
    theta_i = np.radians(30.0)
    v = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    eta = jnp.array([1.0 / 1.5])
    out = np.asarray(vm.refract(v, n, eta))[0]
    sin_t = out[0] / np.linalg.norm(out)
    np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)


def test_refract_straight_through():
    v = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = vm.refract(v, n, jnp.array([0.75]))
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)


def test_onb_orthonormal_right_handed():
    rng = np.random.default_rng(1)
    normals = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    x, y, z = vm.onb_from_normal(normals)
    for a, b in [(x, y), (y, z), (x, z)]:
        np.testing.assert_allclose(vm.dot(a, b), 0.0, atol=1e-5)
    for a in (x, y, z):
        np.testing.assert_allclose(vm.length(a), 1.0, atol=1e-5)
    # y is the normal direction (src/onb.h:21)
    np.testing.assert_allclose(np.asarray(y), np.asarray(vm.normalize(normals)), atol=1e-5)


def test_onb_transform_roundtrip():
    n = jnp.array([[0.0, 0.0, 1.0]])
    x, y, z = vm.onb_from_normal(n)
    local = jnp.array([[0.0, 1.0, 0.0]])  # along the normal axis
    world = vm.onb_transform(local, x, y, z)
    np.testing.assert_allclose(world, [[0.0, 0.0, 1.0]], atol=1e-6)


def test_lerp_smoothstep_fract():
    np.testing.assert_allclose(vm.lerp(jnp.array(0.25), 0.0, 8.0), 2.0)
    np.testing.assert_allclose(vm.smoothstep(0.0, 1.0, jnp.array(0.5)), 0.5)
    np.testing.assert_allclose(vm.fract(jnp.array([1.25, -0.25])), [0.25, 0.75], rtol=1e-6)
