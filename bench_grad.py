"""Secondary benchmark: fwd+bwd (path-replay backprop) ray throughput.

BASELINE.md asks the reverse-mode rate to be tracked alongside the
forward number (the headline lives in bench.py).  Prints one JSON line
{"metric": "cornell_path_fwdbwd_rays_per_sec_chip", ...}.

Rays counted = forward-pass ray queries only (primary + shadow +
extension per bounce); the backward replay re-traces them, so the
figure is per *differentiated* sample — comparable to the forward
number to read off the grad overhead factor.

Same timing protocol as bench.py: two on-device scan lengths differenced
so per-dispatch overhead cancels.
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
    cfg = PathConfig(max_depth=max_depth, remat=True)  # path replay
    n_iters = max_depth - 1

    W = H = 512  # backward pass doubles live memory; keep under HBM
    n = W * H

    def loss(refl, scene, sample_idx):
        scene = scene.replace(bsdfs=scene.bsdfs.replace(refl=refl))
        pix = jnp.arange(n, dtype=jnp.uint32)
        sampler = mrng.make_sampler_v(pix, sample_idx, jnp.uint32(0))
        sampler, blk0 = mrng.next_block4_v(sampler)
        uu = ((pix % W).astype(Float) + blk0[0]) / W
        vv = ((pix // W).astype(Float) + blk0[1]) / H
        o, d, _w = sample_ray_v(scene.sensor, uu, vv, blk0[2], blk0[3])
        li, _ = path_li_v(scene, sampler, o, d, cfg)
        return li.sum().sum()

    grad = jax.grad(loss)

    def scanner(K):
        @jax.jit
        def run(scene):
            def body(acc, s):
                g = grad(scene.bsdfs.refl, scene, s)
                return acc + g.sum(), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32)
            )
            return acc
        return run

    k_lo, k_hi = 4, 16
    run_lo, run_hi = scanner(k_lo), scanner(k_hi)
    float(run_lo(scene))
    float(run_hi(scene))

    def best_time(f, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(scene))
            best = min(best, time.perf_counter() - t0)
        return best

    per_pass = (best_time(run_hi) - best_time(run_lo)) / (k_hi - k_lo)
    rays_per_pass = n * (1 + 2 * n_iters)
    rays_per_sec = rays_per_pass / per_pass

    print(json.dumps({
        "metric": "cornell_path_fwdbwd_rays_per_sec_chip",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / 1e9,
    }))


if __name__ == "__main__":
    main()
