"""Benchmark: wavefront path-tracer ray throughput on the Cornell box.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.json): 1e9 rays/s/chip on Cornell-box-class
scenes.  Rays counted = actual ray-scene queries launched (primary +
shadow + extension per bounce iteration).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_cornell
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li
    from mitsuba_im_tpu.sensor.table import sample_ray

    scene, _settings = _tiny_cornell()
    max_depth = 5
    cfg = PathConfig(max_depth=max_depth)
    n_iters = max_depth - 1

    W = H = 1024
    n = W * H
    spp_per_pass = 1

    @jax.jit
    def render_pass(scene, sample_idx):
        pix = jnp.arange(n, dtype=jnp.uint32)
        sampler = mrng.make_sampler(pix, sample_idx, jnp.uint32(0))
        sampler, blk0 = mrng.next_block4(sampler)
        jitter, u_lens = blk0[..., :2], blk0[..., 2:4]
        pos = jnp.stack([(pix % W).astype(Float), (pix // W).astype(Float)], -1) + jitter
        uv = pos / jnp.asarray([W, H], Float)
        o, d, _w = sample_ray(scene.sensor, uv, u_lens)
        li, _ = path_li(scene, sampler, o, d, cfg)
        return jnp.sum(li)

    # warmup / compile
    n_passes = 24
    sample_ids = [jnp.uint32(s) for s in range(n_passes + 1)]
    render_pass(scene, sample_ids[0]).block_until_ready()
    render_pass(scene, sample_ids[1]).block_until_ready()

    t0 = time.perf_counter()
    acc = 0.0
    for s in range(n_passes):
        acc = render_pass(scene, sample_ids[s + 1])
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    # rays per pass: 1 primary + per iteration (1 shadow + 1 extension)
    rays_per_pass = n * (1 + 2 * n_iters)
    rays_per_sec = rays_per_pass * n_passes / dt

    print(json.dumps({
        "metric": "cornell_path_rays_per_sec_chip",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / 1e9,
    }))


if __name__ == "__main__":
    main()
