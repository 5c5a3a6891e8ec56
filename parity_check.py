"""TPU-vs-CPU render parity gate.

Motivation (round 3 incident): a rewrite of the hierarchy compaction
driver passed the ENTIRE CPU test suite — including front=128 driver
tests — yet changed the render sum on the real TPU by 22%
(5.637e5 -> 6.885e5; suspected duplicate-index scatter nondeterminism
at real scale).  Nothing in the repo would have caught it: tests run on
the CPU mesh and ``bench.py`` asserts nothing about values.  This gate
turns that class of TPU-only correctness bug into a red light: it
renders fixed scenes with a fixed seed on the default (TPU) backend AND
on the in-process CPU backend and requires the results to agree.

Run standalone (``python parity_check.py``) or via ``bench.py`` which
reports the result as a ``parity_ok`` metric every driver round.

Scenes chosen to cover the two distinct execution regimes:
- Cornell wavefront path tracer (fused megakernel regime);
- a ~69k-triangle mesh through the two-level hierarchy at a resolution
  that engages the tail-refill compaction driver (N > FRONT), the exact
  machinery the r3 bug lived in.

Analog of the reference's cross-check discipline (SURVEY §4.4: the
reference validates sampling vs pdf and runs scene regression renders;
here the "other implementation" is the same code on a second backend).
"""
from __future__ import annotations

import sys


RTOL = 5e-3  # f32 reduction-order drift across backends is ~1e-6..1e-4;
             # the r3 bug was 2.2e-1.  5e-3 leaves two orders of margin
             # on both sides.


def _render_cornell(scene, n, W, H, device, skip_direct=False):
    import jax
    import jax.numpy as jnp
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
    from mitsuba_im_tpu.sensor.table import sample_ray_v

    cfg = PathConfig(max_depth=5, remat=False, skip_direct=skip_direct)

    def run(scene):
        pix = jnp.arange(n, dtype=jnp.uint32)
        sampler = mrng.make_sampler_v(pix, jnp.uint32(7), jnp.uint32(0))
        sampler, blk0 = mrng.next_block4_v(sampler)
        uu = ((pix % W).astype(Float) + blk0[0]) / W
        vv = ((pix // W).astype(Float) + blk0[1]) / H
        o, d, _w = sample_ray_v(scene.sensor, uu, vv, blk0[2], blk0[3])
        li, _ = path_li_v(scene, sampler, o, d, cfg)
        return li.sum()

    scene_d = jax.device_put(scene, device)
    with jax.default_device(device):
        return float(jax.jit(run)(scene_d).sum())


def run_parity(verbose=True):
    """Returns dict(ok, checks=[{name, tpu, cpu, rel}])."""
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_cornell
    from bench_scenes import build_large_scene

    default_dev = jax.devices()[0]
    cpu_dev = jax.devices("cpu")[0]
    checks = []

    # --- Cornell wavefront regime -------------------------------------
    scene, _ = _tiny_cornell()
    W = H = 128
    tpu_v = _render_cornell(scene, W * H, W, H, default_dev)
    cpu_v = _render_cornell(scene, W * H, W, H, cpu_dev)
    rel = abs(tpu_v - cpu_v) / max(abs(cpu_v), 1e-30)
    checks.append(dict(name="cornell", tpu=tpu_v, cpu=cpu_v, rel=rel))

    # --- skip_direct (separate-direct MCMC) regime --------------------
    # a traced per-depth mask in the bounce loop miscompiled under
    # whole-program jit on TPU only (78% of lanes kept their depth-2
    # light; eager TPU and CPU agreed); the fix peels the first bounce —
    # this render pins the class
    tpu_v = _render_cornell(scene, W * H, W, H, default_dev,
                            skip_direct=True)
    cpu_v = _render_cornell(scene, W * H, W, H, cpu_dev, skip_direct=True)
    rel = abs(tpu_v - cpu_v) / max(abs(cpu_v), 1e-30)
    checks.append(dict(name="skip_direct", tpu=tpu_v, cpu=cpu_v, rel=rel))

    # --- hierarchy tail-refill driver regime --------------------------
    # 192x192 = 36864 rays > FRONT (8192): the compaction driver with
    # scatter/refill runs on both backends at a scale past the CPU tests'.
    scene, (W, H), _n = build_large_scene(res=192, subdiv=0)
    tpu_v = _render_cornell(scene, W * H, W, H, default_dev)
    cpu_v = _render_cornell(scene, W * H, W, H, cpu_dev)
    rel = abs(tpu_v - cpu_v) / max(abs(cpu_v), 1e-30)
    checks.append(dict(name="large_scene_driver", tpu=tpu_v, cpu=cpu_v,
                       rel=rel))

    ok = all(c["rel"] < RTOL for c in checks)
    if verbose:
        for c in checks:
            flag = "OK " if c["rel"] < RTOL else "FAIL"
            print(f"[{flag}] {c['name']}: tpu={c['tpu']:.6e} "
                  f"cpu={c['cpu']:.6e} rel={c['rel']:.2e}")
    return dict(ok=ok, checks=checks)


if __name__ == "__main__":
    r = run_parity()
    sys.exit(0 if r["ok"] else 1)
