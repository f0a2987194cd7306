"""glTF loader tests (reference: src/gltf_loader.h; fixes per SURVEY.md
appendix item 6)."""

import base64
import json
import os

import numpy as np
import pytest

from cpu_ray_tracing_implementation_tpu.utils import gltf

FOX = "/root/reference/assets/Fox/glTF/Fox.gltf"
FOX_GLB = "/root/reference/assets/Fox/glTF-Binary/Fox.glb"


def _mini_gltf(tmp_path, nodes, scenes=None, meshes=None):
    """One triangle (0,0,0),(1,0,0),(0,1,0) in a data-URI buffer."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": scenes or [{"nodes": [0]}],
        "nodes": nodes,
        "meshes": meshes or [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "uri": "data:application/octet-stream;base64," + base64.b64encode(blob).decode(),
            "byteLength": len(blob),
        }],
    }
    p = os.path.join(tmp_path, "mini.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


@pytest.mark.skipif(not os.path.exists(FOX), reason="reference assets not mounted")
def test_fox_triangle_count():
    """576 triangles, matching the reference's Fox scene (src/main.cc:345)."""
    tris = gltf.load_triangles(FOX)
    assert tris.shape == (576, 3, 3)
    assert np.isfinite(tris).all()


@pytest.mark.skipif(not os.path.exists(FOX_GLB), reason="reference assets not mounted")
def test_glb_container_matches_gltf():
    a = gltf.load_triangles(FOX)
    b = gltf.load_triangles(FOX_GLB)
    assert a.shape == b.shape


def test_data_uri_buffer(tmp_path):
    p = _mini_gltf(str(tmp_path), nodes=[{"mesh": 0}])
    tris = gltf.load_triangles(p)
    assert tris.shape == (1, 3, 3)
    np.testing.assert_allclose(tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_node_translation_applied(tmp_path):
    """Node TRS must move vertices (the reference parses then ignores it)."""
    p = _mini_gltf(str(tmp_path), nodes=[{"mesh": 0, "translation": [10, 0, 0]}])
    tris = gltf.load_triangles(p)
    np.testing.assert_allclose(tris[0, 0], [10, 0, 0], atol=1e-6)


def test_node_hierarchy_composes(tmp_path):
    nodes = [
        {"children": [1], "translation": [0, 5, 0]},
        {"mesh": 0, "scale": [2, 2, 2]},
    ]
    p = _mini_gltf(str(tmp_path), nodes=nodes)
    tris = gltf.load_triangles(p)
    np.testing.assert_allclose(tris[0, 1], [2, 5, 0], atol=1e-6)  # (1,0,0)*2 + (0,5,0)


def test_rotation_quaternion(tmp_path):
    """90-degree rotation about z: (1,0,0) -> (0,1,0)."""
    s = np.sin(np.pi / 4)
    p = _mini_gltf(str(tmp_path), nodes=[{"mesh": 0, "rotation": [0, 0, s, np.cos(np.pi / 4)]}])
    tris = gltf.load_triangles(p)
    np.testing.assert_allclose(tris[0, 1], [0, 1, 0], atol=1e-6)


def test_all_meshes_survive(tmp_path):
    """Two nodes sharing one mesh -> both instances emitted (the reference
    keeps only the last mesh, src/gltf_loader.h:300-303)."""
    nodes = [{"mesh": 0}, {"mesh": 0, "translation": [5, 0, 0]}]
    p = _mini_gltf(str(tmp_path), nodes=nodes, scenes=[{"nodes": [0, 1]}])
    tris = gltf.load_triangles(p)
    assert tris.shape[0] == 2


def test_missing_file_degrades_to_empty():
    tris = gltf.load_triangles("/nonexistent/thing.gltf")
    assert tris.shape == (0, 3, 3)


def test_tangent_attribute_loaded_and_rotated(tmp_path):
    """TANGENT [V,4] survives loading (the reference parses it then drops
    it, src/gltf_loader.h:174,349,770): xyz rotates with the node's linear
    part, w handedness passes through."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    tan = np.array([[1, 0, 0, 1], [1, 0, 0, 1], [1, 0, 0, -1]], np.float32)
    blob = pos.tobytes() + idx.tobytes() + b"\0\0" + tan.tobytes()
    s = np.sin(np.pi / 4)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "rotation": [0, 0, float(s), float(np.cos(np.pi / 4))]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TANGENT": 2}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC4"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            {"buffer": 0, "byteOffset": 44, "byteLength": 48},
        ],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
            "byteLength": len(blob),
        }],
    }
    p = os.path.join(str(tmp_path), "tan.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    asset = gltf.load_asset(p)
    (prim,) = asset.primitives
    assert prim.tangents is not None and prim.tangents.shape == (3, 4)
    # 90-degree z rotation: tangent (1,0,0) -> (0,1,0); w untouched
    np.testing.assert_allclose(prim.tangents[0], [0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(prim.tangents[2, 3], -1, atol=0)
