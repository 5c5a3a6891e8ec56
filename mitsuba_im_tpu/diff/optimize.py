"""Differentiable rendering: scene-parameter gradients + inverse loops.

New capability vs the reference (which has only forward-mode autodiff for
motion vectors, ``/root/reference/include/mitsuba/core/autodiff.h``): the
whole wavefront estimator is differentiable in reverse mode w.r.t. scene
parameters (BSDF reflectance/roughness, emitter radiance, texture atlas).
Memory stays flat because the bounce loop body is ``jax.checkpoint``-ed —
the backward pass re-runs the wavefront with the same RNG counters (path
replay backpropagation) instead of storing per-bounce state.

Discrete sampling decisions (lobe choice, emitter choice, RR kill) depend on
parameters only through the *values* compared against uniforms, and the
uniforms are parameter-independent; gradients flow through the continuous
weights (the standard interior-derivative estimator: silhouettes/visibility
are not differentiated).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import Float
from ..core import rng as mrng
from ..sampler import KIND_BY_NAME
from ..sensor.table import sample_ray
from ..integrators.path import PathConfig, path_li
from ..scene.scene import Scene
from ..scene.build import RenderSettings

# differentiable parameter slots: label -> (getter, setter)
PARAM_SLOTS = {
    "bsdf.refl": (
        lambda s: s.bsdfs.refl,
        lambda s, v: s.replace(bsdfs=s.bsdfs.replace(refl=v)),
    ),
    "bsdf.spec": (
        lambda s: s.bsdfs.spec,
        lambda s, v: s.replace(bsdfs=s.bsdfs.replace(spec=v)),
    ),
    "bsdf.alpha": (
        lambda s: jnp.stack([s.bsdfs.alpha_u, s.bsdfs.alpha_v], -1),
        lambda s, v: s.replace(
            bsdfs=s.bsdfs.replace(alpha_u=v[..., 0], alpha_v=v[..., 1])
        ),
    ),
    "emitter.radiance": (
        lambda s: s.emitters.radiance,
        lambda s, v: s.replace(emitters=s.emitters.replace(radiance=v)),
    ),
    "texture.atlas": (
        lambda s: s.textures.atlas,
        lambda s, v: s.replace(textures=s.textures.replace(atlas=v)),
    ),
}


def get_params(scene: Scene, labels) -> dict:
    return {l: PARAM_SLOTS[l][0](scene) for l in labels}


def set_params(scene: Scene, params: dict) -> Scene:
    for l, v in params.items():
        scene = PARAM_SLOTS[l][1](scene, v)
    return scene


def render_rays(scene: Scene, settings: RenderSettings, cfg: PathConfig,
                pix: jax.Array, sample_idx, seed) -> jax.Array:
    """Differentiable per-pixel radiance estimate for a pixel-index batch."""
    kind = KIND_BY_NAME.get(settings.sampler, mrng.INDEPENDENT)
    sampler = mrng.make_sampler(pix, sample_idx, seed, kind=kind, spp=settings.spp)
    sampler, blk0 = mrng.next_block4(sampler)
    jitter, u_lens = blk0[..., :2], blk0[..., 2:4]
    W, H = settings.width, settings.height
    px = (pix % W).astype(Float)
    py = (pix // W).astype(Float)
    uv = (jnp.stack([px, py], -1) + jitter) / jnp.asarray([W, H], Float)
    o, d, w = sample_ray(scene.sensor, uv, u_lens)
    li, _ = path_li(scene, sampler, o, d, cfg)
    return li * w[..., None]


def make_loss_fn(scene: Scene, settings: RenderSettings, cfg: PathConfig,
                 target: jax.Array, labels):
    """MSE between a one-sample rendered estimate and the target image."""
    W, H = settings.width, settings.height

    def loss(params, sample_idx, seed):
        s = set_params(scene, params)
        pix = jnp.arange(W * H, dtype=jnp.uint32)
        li = render_rays(s, settings, cfg, pix, sample_idx, seed)
        return jnp.mean((li - target.reshape(-1, 3)) ** 2)

    return loss


class OptState(NamedTuple):
    params: dict
    opt_state: object
    step: jax.Array


def make_train_step(scene: Scene, settings: RenderSettings, cfg: PathConfig,
                    target: jax.Array, labels, lr: float = 2e-2):
    """Adam step over the selected differentiable scene parameters."""
    import optax

    tx = optax.adam(lr)
    loss_fn = make_loss_fn(scene, settings, cfg, target, labels)

    @jax.jit
    def step(state: OptState, seed):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, state.step, seed)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(lambda p: jnp.clip(p, 0.0, 1e4), params)
        return OptState(params, opt_state, state.step + 1), loss

    def init():
        params = get_params(scene, labels)
        return OptState(params, tx.init(params), jnp.uint32(0))

    return init, step


def finite_difference_grad(scene: Scene, settings: RenderSettings,
                           cfg: PathConfig, label: str, index, eps: float,
                           n_samples: int = 32, seed: int = 0):
    """Central finite difference of the mean image w.r.t. one parameter —
    the FD-vs-AD parity harness from BASELINE.md."""
    getter, setter = PARAM_SLOTS[label]

    def mean_image(scene):
        acc = 0.0
        pix = jnp.arange(settings.width * settings.height, dtype=jnp.uint32)
        for s in range(n_samples):
            acc = acc + render_rays(scene, settings, cfg, pix, s, seed)
        return acc / n_samples

    base = np.asarray(getter(scene))
    bump = np.zeros_like(base)
    bump[index] = eps
    s_plus = setter(scene, jnp.asarray(base + bump))
    s_minus = setter(scene, jnp.asarray(base - bump))
    img_p = jax.jit(mean_image)(s_plus)
    img_m = jax.jit(mean_image)(s_minus)
    return (np.asarray(img_p) - np.asarray(img_m)) / (2 * eps)


def autodiff_image_grad(scene: Scene, settings: RenderSettings,
                        cfg: PathConfig, label: str, index,
                        n_samples: int = 32, seed: int = 0):
    """d(sum of image)/d(param[index]) via reverse mode, averaged over the
    same sample set as the FD harness -> directly comparable."""
    getter, setter = PARAM_SLOTS[label]

    def scalar_out(theta, sample_idx):
        # substitute one scalar entry so the graph flows through theta
        base = getter(scene)
        flat = base.reshape(-1)
        pos = np.ravel_multi_index(index, base.shape) if isinstance(index, tuple) else index
        flat = flat.at[pos].set(theta)
        s = setter(scene, flat.reshape(base.shape))
        pix = jnp.arange(settings.width * settings.height, dtype=jnp.uint32)
        li = render_rays(s, settings, cfg, pix, sample_idx, seed)
        return jnp.sum(li)

    g = 0.0
    base_val = np.asarray(getter(scene)).reshape(-1)[
        np.ravel_multi_index(index, getter(scene).shape) if isinstance(index, tuple) else index
    ]
    gf = jax.jit(jax.grad(scalar_out))
    for s in range(n_samples):
        g = g + gf(jnp.asarray(base_val, Float), jnp.uint32(s))
    return np.asarray(g) / n_samples
