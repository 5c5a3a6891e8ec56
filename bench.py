"""Benchmark: wavefront path-tracer ray throughput on the Cornell box.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.json): 1e9 rays/s/chip on Cornell-box-class
scenes.  Rays counted = actual ray-scene queries launched (primary +
shadow + extension per bounce iteration).

Timing protocol: on the tunneled TPU platform ``block_until_ready`` can
return before execution finishes (async mode), and the first device->host
transfer switches the runtime into a synchronous mode with a ~35 ms
constant per-dispatch overhead.  Both failure modes are defeated by
(a) forcing completion with a scalar device->host transfer inside the
timed region and (b) differencing two on-device ``lax.scan`` pass counts
so the constant overhead cancels exactly.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_cornell
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
    from mitsuba_im_tpu.sensor.table import sample_ray_v

    scene, _settings = _tiny_cornell()
    max_depth = 5
    # forward-only render: rematerialization only pays off under grad
    cfg = PathConfig(max_depth=max_depth, remat=False)
    n_iters = max_depth - 1

    W = H = 1024
    n = W * H

    def one_pass(scene, sample_idx):
        pix = jnp.arange(n, dtype=jnp.uint32)
        sampler = mrng.make_sampler_v(pix, sample_idx, jnp.uint32(0))
        sampler, blk0 = mrng.next_block4_v(sampler)
        uu = ((pix % W).astype(Float) + blk0[0]) / W
        vv = ((pix // W).astype(Float) + blk0[1]) / H
        o, d, _w = sample_ray_v(scene.sensor, uu, vv, blk0[2], blk0[3])
        li, _ = path_li_v(scene, sampler, o, d, cfg)
        return li.sum().sum()

    def scanner(K):
        @jax.jit
        def run(scene):
            def body(acc, s):
                return acc + one_pass(scene, s), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32)
            )
            return acc
        return run

    k_lo, k_hi = 8, 64
    run_lo, run_hi = scanner(k_lo), scanner(k_hi)
    # warmup/compile; float() forces real completion (and flips the runtime
    # into sync mode, which the differencing below cancels)
    float(run_lo(scene))
    float(run_hi(scene))

    def best_time(f, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(scene))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_time(run_lo)
    t_hi = best_time(run_hi)
    per_pass = (t_hi - t_lo) / (k_hi - k_lo)

    rays_per_pass = n * (1 + 2 * n_iters)
    rays_per_sec = rays_per_pass / per_pass

    print(json.dumps({
        "metric": "cornell_path_rays_per_sec_chip",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / 1e9,
    }))


if __name__ == "__main__":
    main()
