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

Checks cover the distinct execution regimes, each gated PER PIXEL
(99.9th-percentile relative error + bad-pixel fraction — a sum check
would pass a TPU-only bug that merely *redistributes* energy between
pixels, exactly the suspected r3 failure class) plus one gradient
check (d sum(image) / d albedo, TPU vs CPU) so the differentiable
path — the product's whole point — has an on-chip correctness gate:
- Cornell wavefront path tracer (fused megakernel regime);
- the skip_direct peeled-bounce variant;
- reverse-mode path-replay gradients w.r.t. the BSDF albedo table;
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
    """Per-pixel luminance image (numpy (n,)) on the given backend."""
    import numpy as np
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
        return li.x + li.y + li.z

    scene_d = jax.device_put(scene, device)
    with jax.default_device(device):
        return np.asarray(jax.jit(run)(scene_d))


def _grad_cornell(scene, n, W, H, device):
    """d(sum li)/d(albedo table) — the differentiable path on a backend."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
    from mitsuba_im_tpu.sensor.table import sample_ray_v

    cfg = PathConfig(max_depth=5, remat=True)

    def loss(refl, scene):
        scene = scene.replace(bsdfs=scene.bsdfs.replace(refl=refl))
        pix = jnp.arange(n, dtype=jnp.uint32)
        sampler = mrng.make_sampler_v(pix, jnp.uint32(7), jnp.uint32(0))
        sampler, blk0 = mrng.next_block4_v(sampler)
        uu = ((pix % W).astype(Float) + blk0[0]) / W
        vv = ((pix // W).astype(Float) + blk0[1]) / H
        o, d, _w = sample_ray_v(scene.sensor, uu, vv, blk0[2], blk0[3])
        li, _ = path_li_v(scene, sampler, o, d, cfg)
        return li.sum().sum()

    scene_d = jax.device_put(scene, device)
    with jax.default_device(device):
        g = jax.jit(jax.grad(loss))(scene_d.bsdfs.refl, scene_d)
        return np.asarray(g)


def _pix_stats(a, b):
    """Per-pixel relative agreement stats between two luminance images."""
    import numpy as np

    scale = max(float(np.abs(b).mean()), 1e-12)
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-2 * scale)
    return dict(
        max_rel=float(rel.max()),
        p999=float(np.quantile(rel, 0.999)),
        frac_bad=float((rel > 1e-3).mean()),
    )


def run_parity(verbose=True):
    """Returns dict(ok, checks=[{name, tpu, cpu, rel}])."""
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_cornell
    from bench_scenes import build_large_scene

    import numpy as np

    default_dev = jax.devices()[0]
    cpu_dev = jax.devices("cpu")[0]
    checks = []

    def compare(name, tpu_img, cpu_img):
        tpu_v = float(tpu_img.sum())
        cpu_v = float(cpu_img.sum())
        rel = abs(tpu_v - cpu_v) / max(abs(cpu_v), 1e-30)
        st = _pix_stats(tpu_img, cpu_img)
        # per-pixel gate: f32 reduction drift is ~1e-6..1e-4 per pixel,
        # but backend op-order differences can flip a rare hit/miss edge
        # branch on isolated pixels — gate the 99.9th percentile and the
        # bad-pixel FRACTION instead of the absolute max (a redistribution
        # bug like the r3 scatter incident moves whole image regions and
        # blows frac_bad immediately; a flipped seam pixel does not)
        ok = rel < RTOL and st["p999"] < 1e-3 and st["frac_bad"] < 2e-3
        checks.append(dict(name=name, tpu=tpu_v, cpu=cpu_v, rel=rel,
                           ok=ok, **st))

    # --- Cornell wavefront regime -------------------------------------
    scene, _ = _tiny_cornell()
    W = H = 128
    compare("cornell",
            _render_cornell(scene, W * H, W, H, default_dev),
            _render_cornell(scene, W * H, W, H, cpu_dev))

    # --- skip_direct (separate-direct MCMC) regime --------------------
    # a traced per-depth mask in the bounce loop miscompiled under
    # whole-program jit on TPU only (78% of lanes kept their depth-2
    # light; eager TPU and CPU agreed); the fix peels the first bounce —
    # this render pins the class
    compare("skip_direct",
            _render_cornell(scene, W * H, W, H, default_dev,
                            skip_direct=True),
            _render_cornell(scene, W * H, W, H, cpu_dev, skip_direct=True))

    # --- gradient parity (the differentiable path IS the product) -----
    g_tpu = _grad_cornell(scene, W * H, W, H, default_dev)
    g_cpu = _grad_cornell(scene, W * H, W, H, cpu_dev)
    gscale = max(float(np.abs(g_cpu).max()), 1e-12)
    grel = float(np.abs(g_tpu - g_cpu).max() / gscale)
    checks.append(dict(name="grad_albedo", tpu=float(g_tpu.sum()),
                       cpu=float(g_cpu.sum()), rel=grel, ok=grel < RTOL,
                       max_rel=grel, p999=grel, frac_bad=0.0))

    # --- hierarchy tail-refill driver regime --------------------------
    # 192x192 = 36864 rays > FRONT (8192): the compaction driver with
    # scatter/refill runs on both backends at a scale past the CPU tests'.
    scene, (W, H), _n = build_large_scene(res=192, subdiv=0)
    compare("large_scene_driver",
            _render_cornell(scene, W * H, W, H, default_dev),
            _render_cornell(scene, W * H, W, H, cpu_dev))

    ok = all(c["ok"] for c in checks)
    if verbose:
        for c in checks:
            flag = "OK " if c["ok"] else "FAIL"
            print(f"[{flag}] {c['name']}: tpu={c['tpu']:.6e} "
                  f"cpu={c['cpu']:.6e} rel={c['rel']:.2e} "
                  f"p999={c['p999']:.2e} frac_bad={c['frac_bad']:.2e}")
    return dict(ok=ok, checks=checks)


if __name__ == "__main__":
    r = run_parity()
    sys.exit(0 if r["ok"] else 1)
