"""Benchmark: wavefront path-tracer throughput on the real chip.

Prints ONE JSON line.  Top-level keys keep the driver contract
{"metric", "value", "unit", "vs_baseline"} with the headline forward
number (Cornell-box-class, BASELINE north star 1e9 rays/s/chip); the
"metrics" array additionally records the fwd+bwd (path-replay backprop)
rate and a large-scene rate (~1M-triangle mesh + envmap, BASELINE
config 4) so every regime the framework claims is driver-tracked.

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


def _best_time(f, arg, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def _scan_rate(make_run, scene, rays_per_pass, k_lo, k_hi):
    """Differenced-scan timing: rays/s with constant overhead cancelled.

    A freshly-restarted TPU worker can absorb its multi-minute re-init into
    the first timed region, making the difference non-positive; re-measure
    until the estimate is sane (bounded retries)."""
    run_lo, run_hi = make_run(k_lo), make_run(k_hi)
    float(run_lo(scene))  # warmup/compile + force completion
    float(run_hi(scene))
    for _ in range(4):
        per_pass = (_best_time(run_hi, scene) - _best_time(run_lo, scene)) / (
            k_hi - k_lo)
        rate = rays_per_pass / max(per_pass, 1e-12)
        if per_pass > 0 and rate < 1e11:  # plausible for one chip
            return rate
    return rate


def bench_forward():
    import jax
    import jax.numpy as jnp
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
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32))
            return acc
        return run

    rays_per_pass = n * (1 + 2 * n_iters)
    return _scan_rate(scanner, scene, rays_per_pass, 8, 64)


def bench_fwdbwd():
    """fwd+bwd (path-replay backprop) rate; rays counted = forward-pass
    queries so the figure reads directly as grad overhead vs forward."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_cornell
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
    from mitsuba_im_tpu.sensor.table import sample_ray_v

    scene, _settings = _tiny_cornell()
    max_depth = 5
    # remat_group=4: ONE checkpoint unit around the whole bounce loop —
    # the backward pass replays the wavefront once instead of once per
    # bounce, and the 4-bounce residual set still fits HBM at 1024^2.
    # Measured 0.870 vs 0.471 Grays/s for per-bounce remat; gradients
    # bitwise identical (see docs/PERF_NOTES.md round 5)
    cfg = PathConfig(max_depth=max_depth, remat=True, remat_group=4)
    n_iters = max_depth - 1
    # with rematerialization the full 1024^2 wavefront fits in HBM and
    # amortizes fixed costs better than the old 512^2 config
    W = H = 1024
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
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32))
            return acc
        return run

    rays_per_pass = n * (1 + 2 * n_iters)
    return _scan_rate(scanner, scene, rays_per_pass, 4, 16)


def bench_large_scene():
    """BASELINE config 4 regime: ~1M-triangle mesh under an environment
    emitter, forward path tracing through the large-scene intersector."""
    import jax
    import jax.numpy as jnp
    from bench_scenes import build_large_scene
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
    from mitsuba_im_tpu.sensor.table import sample_ray_v

    scene, (W, H), n_tris = build_large_scene(res=768)
    max_depth = 3
    cfg = PathConfig(max_depth=max_depth, remat=False)
    n_iters = max_depth - 1
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
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32))
            return acc
        return run

    rays_per_pass = n * (1 + 2 * n_iters)
    return _scan_rate(scanner, scene, rays_per_pass, 1, 3), n_tris


def main():
    sys.path.insert(0, ".")
    # TPU-vs-CPU render parity gate FIRST (round-3 incident: a driver
    # rewrite passed every CPU test yet changed the TPU render sum by
    # 22%; this makes that class of bug a red light in every bench run)
    try:
        from parity_check import run_parity
        par = run_parity(verbose=False)
        grad = [c for c in par["checks"] if c["name"] == "grad_albedo"]
        parity = dict(metric="tpu_cpu_render_parity", unit="bool",
                      value=1.0 if par["ok"] else 0.0,
                      vs_baseline=1.0 if par["ok"] else 0.0,
                      max_rel=max(c["rel"] for c in par["checks"]),
                      pixel_p999=max(c["p999"] for c in par["checks"]),
                      pixel_frac_bad=max(c["frac_bad"]
                                         for c in par["checks"]),
                      grad_max_rel=grad[0]["rel"] if grad else None)
    except Exception as e:  # pragma: no cover
        parity = dict(metric="tpu_cpu_render_parity", unit="bool",
                      value=0.0, vs_baseline=0.0, error=repr(e)[:200])
    fwd = bench_forward()
    metrics = [dict(metric="cornell_path_rays_per_sec_chip", value=fwd,
                    unit="rays/s", vs_baseline=fwd / 1e9), parity]
    try:
        fb = bench_fwdbwd()
        metrics.append(dict(metric="cornell_path_fwdbwd_rays_per_sec_chip",
                            value=fb, unit="rays/s", vs_baseline=fb / 1e9))
    except Exception as e:  # pragma: no cover - keep the headline alive
        metrics.append(dict(metric="cornell_path_fwdbwd_rays_per_sec_chip",
                            value=0.0, unit="rays/s", vs_baseline=0.0,
                            error=repr(e)[:200]))
    try:
        big, n_tris = bench_large_scene()
        metrics.append(dict(metric="large_scene_rays_per_sec_chip",
                            value=big, unit="rays/s",
                            vs_baseline=big / 1e9, n_tris=n_tris))
    except Exception as e:  # pragma: no cover
        metrics.append(dict(metric="large_scene_rays_per_sec_chip",
                            value=0.0, unit="rays/s", vs_baseline=0.0,
                            error=repr(e)[:200]))

    print(json.dumps(dict(
        metric="cornell_path_rays_per_sec_chip",
        value=fwd, unit="rays/s", vs_baseline=fwd / 1e9,
        metrics=metrics,
    )))


if __name__ == "__main__":
    main()
