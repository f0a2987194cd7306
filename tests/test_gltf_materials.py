"""glTF per-primitive material binding (SceneBuilder.gltf_asset).

The reference parses glTF pbrMetallicRoughness (baseColorFactor +
baseColorTexture) and then discards it — no main.cc scene reads loader
materials (src/gltf_loader.h:706-758), and every mesh gets one hand-picked
material. Here the loader keeps the parsed base color and
SceneBuilder.gltf_asset binds it per primitive: texture-mapped lambertian
when a baseColorTexture exists, solid baseColorFactor otherwise.
"""

import base64
import io
import json

import jax
import numpy as np

from cpu_ray_tracing_implementation_tpu.models import camera as cam_mod
from cpu_ray_tracing_implementation_tpu.models import integrator
from cpu_ray_tracing_implementation_tpu.models import scene as scene_mod
from cpu_ray_tracing_implementation_tpu.utils import gltf


def _png_bytes(arr_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8, "RGB").save(buf, format="PNG")
    return buf.getvalue()


def _two_material_gltf(tmp_path) -> str:
    """Two single-triangle primitives: one solid-red baseColorFactor, one
    with a 2x2 green/blue baseColorTexture via data URIs."""
    # two triangles in the z=0 plane, facing +z
    pos0 = np.array([[-1, -1, 0], [0, -1, 0], [-0.5, 0, 0]], np.float32)
    pos1 = np.array([[0.2, -1, 0], [1.2, -1, 0], [0.7, 0, 0]], np.float32)
    uv1 = np.array([[0.25, 0.75], [0.75, 0.75], [0.5, 0.25]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)

    blobs, views, accessors = [], [], []

    def add(arr, target, type_, comp):
        off = sum(len(b) for b in blobs)
        raw = arr.tobytes()
        blobs.append(raw + b"\x00" * (-len(raw) % 4))
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(raw),
                      "target": target})
        accessors.append({"bufferView": len(views) - 1, "componentType": comp,
                          "count": len(arr), "type": type_})
        return len(accessors) - 1

    a_p0 = add(pos0, 34962, "VEC3", 5126)
    a_p1 = add(pos1, 34962, "VEC3", 5126)
    a_uv = add(uv1, 34962, "VEC2", 5126)
    a_i = add(idx, 34963, "SCALAR", 5123)

    tex = np.zeros((2, 2, 3), np.uint8)
    tex[:, 0] = (0, 255, 0)   # left texels green
    tex[:, 1] = (0, 0, 255)   # right texels blue
    png_uri = ("data:image/png;base64,"
               + base64.b64encode(_png_bytes(tex)).decode())

    buf = b"".join(blobs)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": a_p0},
                             "indices": a_i, "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": a_p1,
                                            "TEXCOORD_0": a_uv},
                             "indices": a_i, "material": 1}]},
        ],
        "materials": [
            {"name": "solid_red", "pbrMetallicRoughness":
                {"baseColorFactor": [0.8, 0.1, 0.1, 1.0]}},
            {"name": "textured", "pbrMetallicRoughness":
                {"baseColorTexture": {"index": 0}}},
        ],
        "textures": [{"source": 0}],
        "images": [{"uri": png_uri}],
        "buffers": [{"byteLength": len(buf),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(buf).decode()}],
        "bufferViews": views,
        "accessors": accessors,
    }
    p = tmp_path / "two_mat.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


def test_loader_parses_materials(tmp_path):
    asset = gltf.load_asset(_two_material_gltf(tmp_path))
    assert len(asset.primitives) == 2 and len(asset.materials) == 2
    m0, m1 = asset.materials
    np.testing.assert_allclose(m0.base_color_factor, (0.8, 0.1, 0.1, 1.0))
    assert m0.base_color_image is None
    assert m1.base_color_image is not None
    assert m1.base_color_image.shape == (2, 2, 3)
    # byte-scale float, green/blue texels
    np.testing.assert_allclose(m1.base_color_image[0, 0], (0, 255, 0))
    np.testing.assert_allclose(m1.base_color_image[0, 1], (0, 0, 255))
    assert asset.primitives[0].material == 0
    assert asset.primitives[1].material == 1


def test_builder_binds_per_primitive(tmp_path):
    asset = gltf.load_asset(_two_material_gltf(tmp_path))
    b = scene_mod.SceneBuilder()
    n = b.gltf_asset(asset)
    assert n == 2
    b.set_background(b.solid((1.0, 1.0, 1.0)))  # white sky lights the tris
    scene = b.build()
    # two distinct materials bound
    mats = {int(m) for m in np.asarray(scene.tris.mat)}
    assert len(mats) == 2

    # render both triangles head-on: left pixel block sees the solid red,
    # right block the texture (UVs at v=0.25-0.75 with the builder's v-flip
    # land mid-texture)
    cam = cam_mod.perspective(32, 2.0, (0, -0.5, 3), (0, -0.5, 0), 1, 40.0,
                              16, 2)
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(0)))
    assert np.isfinite(img).all()
    h, w, _ = img.shape
    left = img[:, : w // 2].reshape(-1, 3)
    right = img[:, w // 2:].reshape(-1, 3)
    # non-gray pixels are triangle hits (the white sky is achromatic)
    chroma = lambda px: px[np.ptp(px, axis=-1) > 0.05]
    red_px = chroma(left)
    assert len(red_px) > 0
    assert (red_px[:, 0] > red_px[:, 1]).mean() > 0.8
    tex_px = chroma(right)
    assert len(tex_px) > 0
    assert (tex_px[:, 0] < np.maximum(tex_px[:, 1], tex_px[:, 2])).mean() > 0.8


def test_textured_fox_uses_gltf_binding():
    """textured_fox binds the Fox's own glTF material (Texture.png as
    baseColorTexture) instead of hand-picking it; the scene still builds
    with a picture texture and renders finite."""
    from cpu_ray_tracing_implementation_tpu.models import catalog
    from cpu_ray_tracing_implementation_tpu.models.scene import TEX_PICTURE

    scene, cam = catalog.textured_fox(width=12, spp=1, max_depth=2)
    ttypes = set(np.asarray(scene.textures.ttype).tolist())
    assert TEX_PICTURE in ttypes
    img = np.asarray(integrator.render_image(scene, cam, jax.random.key(0)))
    assert np.isfinite(img).all() and img.mean() > 0.01
