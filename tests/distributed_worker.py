"""Subprocess entry for the multi-process (multi-host simulation) test.

Each process owns 4 virtual CPU devices; ``jax.distributed`` joins them
into one 8-device global mesh (SURVEY.md §4 multi-node testing strategy).
Usage: python distributed_worker.py <pid> <nproc> <coordinator> <out.npy>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)


def main():
    pid, nproc, coord, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    from __graft_entry__ import _tiny_cornell
    from mitsuba_im_tpu.parallel import mesh as pm

    scene, settings = _tiny_cornell()
    settings.width = settings.height = 16
    settings.spp = 2
    settings.integrator_props = {"max_depth": 3}

    mesh = pm.make_mesh()  # global 8-device mesh
    scene = pm.replicate_to_mesh(scene, mesh)
    img = pm.render_sharded(mesh, scene, settings, spp=2)
    if pid == 0:
        np.save(out, np.asarray(img))
    # all processes must reach teardown together
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
