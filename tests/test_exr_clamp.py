"""Minimal EXR codec (utils/exr.py) + firefly clamp (camera.clamp)."""

import struct

import jax
import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.models import catalog, film, integrator
from cpu_ray_tracing_implementation_tpu.utils import exr, image_io


def test_exr_float_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((7, 13, 3)) * 20.0).astype(np.float32)  # HDR range
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img)
    back = exr.read_exr(p)
    np.testing.assert_array_equal(back, img)  # float32, lossless


def test_exr_half_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((5, 9, 3)) * 4.0).astype(np.float32)
    p = str(tmp_path / "h.exr")
    exr.write_exr(p, img, half=True)
    back = exr.read_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-3)


def test_exr_rejects_non_exr(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr at all")
    with pytest.raises(ValueError, match="not an EXR"):
        exr.read_exr(str(p))


def test_exr_rejects_compressed(tmp_path):
    """A compression byte != 0 must raise, not decode garbage."""
    rng = np.random.default_rng(2)
    p = str(tmp_path / "c.exr")
    exr.write_exr(p, rng.random((3, 3, 3)).astype(np.float32))
    raw = bytearray(open(p, "rb").read())
    i = raw.index(b"compression\0compression\0")
    # attribute payload starts after name, type, and int32 size
    at = i + len(b"compression\0compression\0") + 4
    raw[at] = 3  # pretend ZIP
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="compression"):
        exr.read_exr(str(p))


def test_image_io_reads_own_exr(tmp_path):
    """load_image round-trips files written by film.write_exr (byte-scale,
    clamped — the src/image.h:107-117 convention)."""
    img = np.array([[[0.25, 0.5, 2.0]]], np.float32)
    p = str(tmp_path / "io.exr")
    film.write_exr(p, img)
    got = image_io.load_image(p)
    np.testing.assert_allclose(got, [[[63.75, 127.5, 255.0]]], rtol=1e-5)


def test_write_exr_preserves_hdr(tmp_path):
    """A render written as EXR keeps radiance > 1 exactly (PNG clamps)."""
    scene, cam = catalog.cornell_box(width=12, spp=2, max_depth=2)
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(0)))
    assert img.max() > 1.0  # the light is ~15
    p = str(tmp_path / "r.exr")
    film.write_exr(p, img)
    np.testing.assert_array_equal(exr.read_exr(p), img)


def test_firefly_clamp():
    """clamp=C caps every sample's radiance at C: the light pixels drop to
    C exactly, and no pixel of the clamped render exceeds the unclamped."""
    scene, cam = catalog.cornell_box(width=16, spp=4, max_depth=2)
    key = jax.random.key(0)
    plain = np.asarray(integrator.render_image(scene, cam, key))
    clamped = np.asarray(integrator.render_image(
        scene, cam.replace(clamp=1.0), key))
    assert plain.max() > 1.0
    assert clamped.max() <= 1.0 + 1e-6
    assert (clamped <= plain + 1e-6).all()
    # dim pixels (never near the clamp) are untouched
    dim = plain.max(-1) < 0.5
    np.testing.assert_allclose(clamped[dim], plain[dim], rtol=1e-6)


def test_firefly_clamp_wavefront_matches_classic():
    scene, cam = catalog.cornell_box(width=16, spp=4, max_depth=2)
    cam = cam.replace(clamp=2.0)
    key = jax.random.key(1)
    classic = np.asarray(integrator.render_image(scene, cam, key))
    wave = np.asarray(integrator.render_image_wavefront(scene, cam, key))
    np.testing.assert_allclose(wave, classic, rtol=2e-4, atol=2e-5)
