"""Differentiable rendering: autodiff vs finite differences (BASELINE.md
gradient-parity harness) and inverse-rendering convergence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_im_tpu.integrators.path import PathConfig
from mitsuba_im_tpu.diff.optimize import (
    finite_difference_grad, autodiff_image_grad, make_train_step, get_params,
)
from mitsuba_im_tpu.scene.build import RenderSettings


def tiny_scene():
    from __graft_entry__ import _tiny_cornell

    scene, settings = _tiny_cornell()
    settings.width = settings.height = 12
    return scene, settings


class TestGradParity:
    @pytest.mark.parametrize(
        "label,index,eps",
        [
            ("bsdf.refl", (0, 0), 0.05),       # white-wall red albedo
            ("emitter.radiance", (0, 1), 1.0),  # light green radiance
        ],
    )
    def test_ad_matches_fd(self, label, index, eps):
        scene, settings = tiny_scene()
        cfg = PathConfig(max_depth=3, depth_budget=3)
        n_samples = 48
        fd_img = finite_difference_grad(
            scene, settings, cfg, label, index, eps, n_samples=n_samples
        )
        fd = fd_img.sum()
        ad = autodiff_image_grad(
            scene, settings, cfg, label, index, n_samples=n_samples
        )
        # detached-sampling AD and FD agree in expectation; same RNG stream
        # keeps the residual noise small
        assert np.isfinite(ad) and np.isfinite(fd)
        assert fd > 0  # more albedo/radiance -> brighter image
        np.testing.assert_allclose(ad, fd, rtol=0.08)

    def test_grad_zero_for_unused_param(self):
        scene, settings = tiny_scene()
        cfg = PathConfig(max_depth=2, depth_budget=2)
        # bsdf 3 (light's own bsdf) barely affects a depth-2 render of wall
        # pixels, but bsdf.refl of the light shape contributes nothing at
        # depth 1 visibility; instead check: gradient wrt spec of a diffuse
        # scene is exactly zero (spec unused by DIFFUSE lobes)
        ad = autodiff_image_grad(scene, settings, cfg, "bsdf.spec", (0, 0),
                                 n_samples=4)
        assert ad == 0.0


class TestInverseRendering:
    def test_albedo_recovery(self):
        """Optimize wall albedo to match a target render (the core inverse
        loop the reference cannot do)."""
        scene, settings = tiny_scene()
        cfg = PathConfig(max_depth=3, depth_budget=3)

        # target: the true scene rendered with a few samples
        from mitsuba_im_tpu.diff.optimize import render_rays

        pix = jnp.arange(settings.width * settings.height, dtype=jnp.uint32)
        target = 0.0
        for s in range(8):
            target = target + render_rays(scene, settings, cfg, pix, 1000 + s, 0)
        target = target / 8.0

        # perturb: all refl rows to 0.35 gray
        perturbed = scene.replace(
            bsdfs=scene.bsdfs.replace(refl=jnp.full_like(scene.bsdfs.refl, 0.35))
        )
        init, step = make_train_step(
            perturbed, settings, cfg,
            target.reshape(settings.height, settings.width, 3),
            ("bsdf.refl",), lr=5e-2,
        )
        st = init()
        losses = []
        for i in range(60):
            st, loss = step(st, jnp.uint32(0))
            losses.append(float(loss))
        true_refl = np.asarray(scene.bsdfs.refl)
        got = np.asarray(st.params["bsdf.refl"])
        # the visible wall albedos (rows 0-2) should move toward truth
        err0 = np.abs(true_refl[:3] - 0.35).mean()
        err1 = np.abs(true_refl[:3] - got[:3]).mean()
        assert err1 < 0.4 * err0, (losses[:3], losses[-3:], got[:3], true_refl[:3])


@pytest.mark.quick
@pytest.mark.slow
def test_shading_grads_flow_on_hierarchy_scene(rng):
    """Gradient-boundary contract (README differentiability row): scenes
    above BRUTE_FORCE_MAX trace hits under stop_gradient, but shading-side
    gradients (albedo here) must still flow through the hierarchy path."""
    import jax
    import jax.numpy as jnp
    from mitsuba_im_tpu.scene.build import SceneBuilder
    from mitsuba_im_tpu.scene.mesh import TriMesh
    from mitsuba_im_tpu.core.registry import create as reg_create
    from mitsuba_im_tpu.core.properties import Properties
    from mitsuba_im_tpu.core.transform import Transform
    from mitsuba_im_tpu.sensor.table import make_sensor, S_PERSPECTIVE
    from mitsuba_im_tpu.core import rng as mrng
    from mitsuba_im_tpu.core.types import Float
    from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
    from mitsuba_im_tpu.sensor.table import sample_ray_v

    # ~1300-triangle displaced sphere: comfortably above BRUTE_FORCE_MAX
    from bench_scenes import _displaced_sphere

    pos, idx = _displaced_sphere(1300)
    b = SceneBuilder()
    mat = Properties("diffuse")
    mat.set("reflectance", [0.6, 0.4, 0.3])
    bid = b.add_bsdf(reg_create("bsdf", mat, b))
    sid = b.new_shape(bid)
    b.add_trimesh(TriMesh(pos, idx).compute_normals(), sid)
    ep = Properties("constant")
    b.add_emitter(reg_create("emitter", ep, b))
    b.sensor = make_sensor(
        S_PERSPECTIVE, Transform.look_at([0, 0.05, 0.35], [0, 0, 0],
                                         [0, 1, 0]), fov_deg=40.0)
    scene, _settings = b.build()
    assert scene.clusters is not None or scene.use_bvh  # large-scene path

    W = H = 16
    n = W * H
    cfg = PathConfig(max_depth=2, remat=False)

    def loss(refl):
        sc = scene.replace(bsdfs=scene.bsdfs.replace(refl=refl))
        pix = jnp.arange(n, dtype=jnp.uint32)
        sampler = mrng.make_sampler_v(pix, jnp.uint32(0), jnp.uint32(0))
        sampler, blk0 = mrng.next_block4_v(sampler)
        uu = ((pix % W).astype(Float) + blk0[0]) / W
        vv = ((pix // W).astype(Float) + blk0[1]) / H
        o, d, _w = sample_ray_v(scene.sensor, uu, vv, blk0[2], blk0[3])
        li, _ = path_li_v(sc, sampler, o, d, cfg)
        return li.sum().sum()

    g = jax.grad(loss)(scene.bsdfs.refl)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # the sphere's albedo receives a strictly positive derivative
    assert g[0].sum() > 1e-3
