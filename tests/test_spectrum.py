"""Spectrum tests (reference semantics: src/spectrum.h)."""

import jax.numpy as jnp
import numpy as np

from cpu_ray_tracing_implementation_tpu.ops import spectrum as sp


def test_bin_count_and_range():
    assert sp.NUM_BINS == 75  # (750-380)/5 + 1 (src/spectrum.h:4-10)
    assert sp.WAVELENGTHS[0] == 380 and sp.WAVELENGTHS[-1] == 750


def test_line_and_add():
    s = sp.line(540.0, 2.0)
    assert float(s.sum()) == 2.0
    assert float(s[(540 - 380) // 5]) == 2.0
    s2 = sp.add_line(s, 540.0, 1.0)
    assert float(s2[(540 - 380) // 5]) == 3.0


def test_wavelength_to_rgb_landmarks():
    """Pure hues at segment interiors (src/spectrum.h:146-172)."""
    blue = np.asarray(sp.wavelength_to_rgb(400.0))
    assert blue[2] > 0 and blue[1] == 0  # violet-blue band
    green = np.asarray(sp.wavelength_to_rgb(500.0))
    assert green[1] == 255 and green[0] == 0
    red = np.asarray(sp.wavelength_to_rgb(700.0))
    assert red[0] == 255 and red[1] == 0 and red[2] == 0
    assert (np.asarray(sp.wavelength_to_rgb(200.0)) == 0).all()
    assert (np.asarray(sp.wavelength_to_rgb(900.0)) == 0).all()


def test_batched_map_matches_scalar():
    wls = np.linspace(380, 750, 75)
    batched = np.asarray(sp.wavelength_to_rgb(wls))
    scalar = np.stack([sp._wavelength_to_rgb_scalar(w) for w in wls])
    np.testing.assert_allclose(batched, scalar, atol=1.0)


def test_to_rgb_single_line_recovers_hue():
    """An SPD with one line must map to that wavelength's RGB
    (normalization by total intensity, src/spectrum.h:216-227)."""
    s = sp.line(650.0, 5.0)
    rgb = np.asarray(sp.to_rgb(s))
    expect = np.asarray(sp.wavelength_to_rgb(650.0))
    np.testing.assert_allclose(rgb, expect, atol=0.5)


def test_to_rgb_zero_spd_is_black():
    np.testing.assert_array_equal(np.asarray(sp.to_rgb(sp.zeros())), np.zeros(3))


def test_to_rgb_batched_differentiable():
    import jax

    def f(spd):
        return sp.to_linear_rgb(spd).sum()

    g = jax.grad(f)(sp.constant(1.0))
    assert np.isfinite(np.asarray(g)).all()
