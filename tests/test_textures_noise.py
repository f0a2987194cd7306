"""Texture & noise tests (reference semantics: src/texture.h, src/noise.h)."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
from cpu_ray_tracing_implementation_tpu.ops import noise as noise_ops
from cpu_ray_tracing_implementation_tpu.ops.textures import eval_texture


def _eval(builder, tex_id, p, u=0.0, v=0.0):
    s = builder.build()
    n = len(p)
    return eval_texture(
        s,
        jnp.full((n,), tex_id, jnp.int32),
        jnp.full((n,), u), jnp.full((n,), v),
        jnp.asarray(p, jnp.float32),
    )


def test_solid_color():
    b = SceneBuilder()
    t = b.solid((0.1, 0.2, 0.3))
    out = _eval(b, t, [[0, 0, 0]])
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3], rtol=1e-6)


def test_checker_parity_3d():
    """floor(p/scale) parity flips between adjacent cells (src/texture.h:47-56)."""
    b = SceneBuilder()
    t = b.checker(odd=(1, 0, 0), even=(0, 1, 0), scale=1.0)
    out = np.asarray(_eval(b, t, [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [1.5, 1.5, 0.5]]))
    np.testing.assert_allclose(out[0], [0, 1, 0], atol=1e-6)  # sum 0 -> even
    np.testing.assert_allclose(out[1], [1, 0, 0], atol=1e-6)  # sum 1 -> odd
    np.testing.assert_allclose(out[2], [0, 1, 0], atol=1e-6)  # sum 2 -> even


def test_picture_texture_lookup():
    """Nearest texel, v flipped, /256 scale (src/texture.h:68-74)."""
    b = SceneBuilder()
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [256, 0, 0]   # top-left in image space
    img[1, 1] = [0, 256, 0]   # bottom-right
    t = b.picture(img)
    s = b.build()
    out = eval_texture(s, jnp.array([t, t], jnp.int32),
                       jnp.array([0.1, 0.9]), jnp.array([0.9, 0.1]),
                       jnp.zeros((2, 3)))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)  # u~0,v~1 -> row 0, col 0
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)


def test_perlin_marble_range():
    b = SceneBuilder()
    t = b.perlin(2.0)
    rng = np.random.default_rng(0)
    p = rng.uniform(-10, 10, (256, 3))
    out = np.asarray(_eval(b, t, p))
    assert (out >= 0).all() and (out <= 1).all()
    assert out.std() > 0.01  # actually varies


def test_perlin_noise_zero_mean_band():
    grad, perm = noise_ops.make_perlin_tables(0)
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-20, 20, (4096, 3)).astype(np.float32))
    n = np.asarray(noise_ops.perlin_noise(p, jnp.asarray(grad), jnp.asarray(perm)))
    assert np.abs(n.mean()) < 0.05
    assert (np.abs(n) <= 1.2).all()


def test_value_noise_interpolates_grid():
    grid = np.zeros((4, 4, 4), np.float32)
    grid[1, 1, 1] = 1.0
    g = jnp.asarray(grid)
    at_node = noise_ops.value_noise(jnp.array([[1.0, 1.0, 1.0]]), g)
    np.testing.assert_allclose(at_node[0], 1.0, atol=1e-6)
    mid = noise_ops.value_noise(jnp.array([[1.5, 1.0, 1.0]]), g)
    np.testing.assert_allclose(mid[0], 0.5, atol=1e-6)
    # out-of-range points are clamped (reference reads OOB, SURVEY item 7)
    far = noise_ops.value_noise(jnp.array([[99.0, -5.0, 1.0]]), g)
    assert np.isfinite(np.asarray(far)).all()


def test_worley_voronoi_finite_and_bounded():
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.uniform(-8, 8, (512, 3)).astype(np.float32))
    w = np.asarray(noise_ops.worley_noise(p))
    assert (w >= 0).all() and (w <= 3.0).all()  # min dist^2 within 27-cell hood
    v = np.asarray(noise_ops.voronoi_noise(p))
    assert (v >= 0).all() and (v <= 1.0).all()


def test_unused_texture_types_not_traced():
    """Static tex_types_used gates XLA branches: a solid-only scene's
    evaluation graph must not touch the noise tables."""
    b = SceneBuilder()
    t = b.solid((1, 0, 0))
    s = b.build()
    assert s.tex_types_used == (0,)


def test_bilinear_picture_filter():
    """picture(filter="bilinear") interpolates between texels (midpoint of
    a black/white 2x1 image = 0.5), while the default nearest snaps; both
    agree exactly at texel centers, and nearest-only scenes keep the old
    graph (has_bilinear static flag off)."""
    import jax.numpy as jnp
    import numpy as np

    from cpu_ray_tracing_implementation_tpu.models.scene import SceneBuilder
    from cpu_ray_tracing_implementation_tpu.ops.textures import eval_texture

    img = np.zeros((1, 2, 3), np.float32)
    img[0, 1] = 256.0  # right texel white (byte scale, /256 on eval)

    def build(filt):
        b = SceneBuilder()
        t = b.picture(img, filter=filt)
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        return b.build(), t

    s_near, t_n = build("nearest")
    s_bi, t_b = build("bilinear")
    assert not s_near.has_bilinear and s_bi.has_bilinear

    u = jnp.asarray([0.25, 0.75, 0.5], jnp.float32)   # centers, midpoint
    v = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    p = jnp.zeros((3, 3), jnp.float32)
    tid = jnp.full((3,), t_n, jnp.int32)

    near = np.asarray(eval_texture(s_near, tid, u, v, p))
    bi = np.asarray(eval_texture(s_bi, jnp.full((3,), t_b, jnp.int32),
                                 u, v, p))
    # texel centers agree between filters
    np.testing.assert_allclose(bi[0], near[0], atol=1e-6)
    np.testing.assert_allclose(bi[1], near[1], atol=1e-6)
    # midpoint: nearest snaps to one texel, bilinear averages
    assert near[2, 0] in (0.0, 1.0)
    np.testing.assert_allclose(bi[2], 0.5, atol=1e-6)
