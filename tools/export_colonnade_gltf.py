"""Export the colonnade stand-in mesh as a glTF the REFERENCE binary loads.

Purpose (round-5 head-to-head): the reference's BVH-at-scale workload is its
sponza scene (/root/reference/src/main.cc:439-498 — 262k triangles through
its bvh_node), but the snapshot is missing assets/Sponza/glTF/Sponza.bin
(.MISSING_LARGE_BLOBS), so the reference CPU number on large geometry was
never measurable. This tool writes the SAME 258k-triangle procedural
colonnade the repo's sponza scene renders (utils/procgen.colonnade_hall,
seed pinned) into a minimal glTF 2.0 file shaped for the reference's
hand-rolled loader (src/gltf_loader.h):

 - ONE mesh, ONE primitive, POSITION only, NON-INDEXED (mode 4): the
   reference's sponza path only handles float positions and u16 indices
   (src/main.cc:452,463) and 258k tris exceed u16, so each triangle's three
   vertices are written consecutively and the `use_indices == false` branch
   (src/main.cc:478-484) consumes them 3 at a time.
 - explicit "byteStride": 0 (the loader defaults absent byteStride to 1 and
   then memcpys byte-by-byte, src/gltf_loader.h:524,672-675).
 - buffers[0].uri is the .bin (the loader reads only buffers[0],
   src/gltf_loader.h:565).

Usage:
    python tools/export_colonnade_gltf.py /tmp/refws
    # then: cd /tmp/refws && printf 'sponza.ppm\n14\n' | /tmp/refbuild/ref_tracer
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cpu_ray_tracing_implementation_tpu.utils import procgen  # noqa: E402


def export(workdir: str, target_tris: int = 260_000) -> str:
    verts = procgen.colonnade_hall(target_tris=target_tris)  # [N,3,3] f32
    # Drop exactly-degenerate (zero-area) triangles: the colonnade's cap
    # fans / sphere poles emit ~1.5% of them. Our tracer kills them
    # intrinsically (plane-test d_n == 0 guard), but the reference's
    # triangle has NO degeneracy guard: moller_trumbore divides by
    # dot(s1, e1) == 0 (src/triangle.h:14), the resulting NaN t passes
    # `t < min || t > max` (NaN compares false, src/triangle.h:32-34), so
    # EVERY ray "hits" a degenerate triangle at t = NaN and the whole
    # frame renders NaN-black. Found round 5 while standing up the
    # head-to-head; both sides of the comparison render this filtered set.
    v64 = verts.astype(np.float64)
    area2 = np.linalg.norm(
        np.cross(v64[:, 1] - v64[:, 0], v64[:, 2] - v64[:, 0]), axis=1)
    keep = area2 > 0.0
    dropped = int((~keep).sum())
    if dropped:
        print(f"filtered {dropped} zero-area triangles "
              "(reference triangle.h NaN-poisons on them)")
    verts = verts[keep]
    n_tri = len(verts)
    pos = np.ascontiguousarray(verts.reshape(-1, 3), np.float32)  # [3N,3]

    gdir = os.path.join(workdir, "assets", "Sponza", "glTF")
    os.makedirs(gdir, exist_ok=True)
    bin_path = os.path.join(gdir, "Sponza.bin")
    pos.tofile(bin_path)
    nbytes = pos.nbytes

    gltf = {
        "asset": {"version": "2.0", "generator": "colonnade-export"},
        "scene": 0,
        "scenes": [{"name": "scene", "nodes": [0]}],
        "nodes": [{"name": "colonnade", "mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "mode": 4}]}],
        "accessors": [{
            "bufferView": 0, "byteOffset": 0, "componentType": 5126,
            "count": int(pos.shape[0]), "type": "VEC3",
            "min": [float(x) for x in pos.min(0)],
            "max": [float(x) for x in pos.max(0)],
        }],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": nbytes, "byteStride": 0}],
        "buffers": [{"uri": "Sponza.bin", "byteLength": nbytes}],
    }
    gltf_path = os.path.join(gdir, "Sponza.gltf")
    with open(gltf_path, "w") as f:
        json.dump(gltf, f)
    print(f"wrote {gltf_path} ({n_tri} triangles, {nbytes / 1e6:.1f} MB bin)")
    return gltf_path


if __name__ == "__main__":
    export(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refws")
