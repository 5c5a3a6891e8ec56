"""Multi-process rendering: 2 processes x 4 CPU devices == one 8-device
mesh, bitwise-identical to the single-process result (SURVEY.md §4
multi-host strategy; the film all-reduce crosses the process boundary)."""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultiProcess:
    def test_two_process_parity(self, tmp_path):
        port = _free_port()
        coord = f"127.0.0.1:{port}"
        out = str(tmp_path / "mp.npy")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(HERE, "distributed_worker.py"),
                 str(pid), "2", coord, out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                o, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("distributed worker timed out")
            outs.append(o.decode(errors="replace"))
        for p, o in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{o[-2000:]}"
        assert os.path.exists(out)
        img_mp = np.load(out)

        # single-process baseline on the test session's own 8-device mesh
        from __graft_entry__ import _tiny_cornell
        from mitsuba_im_tpu.parallel import mesh as pm

        scene, settings = _tiny_cornell()
        settings.width = settings.height = 16
        settings.spp = 2
        settings.integrator_props = {"max_depth": 3}
        mesh = pm.make_mesh()
        img_sp = pm.render_sharded(mesh, scene, settings, spp=2)

        assert img_mp.shape == img_sp.shape
        np.testing.assert_array_equal(img_mp, np.asarray(img_sp))
