"""Real 2-process jax.distributed test for parallel/multihost.py.

Spawns two CPU processes (2 virtual devices each) that join one
jax.distributed job over a localhost coordinator — the faithful miniature
of a 2-host pod slice (SURVEY.md §4e) — and asserts both ranks return the
SAME full image from render_image_global, matching a single-process render
of the identical workload (the per-pixel RNG fold makes this exact).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

coord, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from cpu_ray_tracing_implementation_tpu.parallel import multihost

multihost.initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
from cpu_ray_tracing_implementation_tpu.models import catalog

scene, cam = catalog.cornell_box(width=16, spp=2, max_depth=2)
img = multihost.render_image_global(scene, cam, jax.random.key(0), spp=2)
np.save(out, img)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_identical(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"rank{pid}.npy"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid), str(out)],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, stderr.decode()[-2000:]

    img0 = np.load(outs[0])
    img1 = np.load(outs[1])
    assert img0.shape == (16, 16, 3)
    np.testing.assert_array_equal(img0, img1)

    # must equal the single-process render of the same workload bit-for-bit
    # (pixel-id keyed RNG; see parallel/mesh.py)
    import jax

    from cpu_ray_tracing_implementation_tpu.models import catalog, integrator

    scene, cam = catalog.cornell_box(width=16, spp=2, max_depth=2)
    ref = np.asarray(integrator.render_image(scene, cam, jax.random.key(0),
                                             spp=2))
    np.testing.assert_allclose(img0, ref, atol=1e-6)
