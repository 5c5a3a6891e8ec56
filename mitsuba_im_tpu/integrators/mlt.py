"""Veach-style MLT: structured path mutations over the replayable sample
space.

Parity target: ``/root/reference/src/integrators/mlt/mlt.cpp`` with its
mutator set ``src/libbidir/mut_lens.h``, ``mut_caustic.h``, ``mut_mchain.h``,
``mut_manifold.cpp`` — pointer-walking edits of an explicit vertex chain,
each preserving part of the path while regenerating the rest.

TPU-native reframe: the stateless counter RNG makes every path a
*deterministic replay* of its primary-sample table (1 camera block + 3
blocks per bounce), so "preserve part of the path" = "hold those blocks
fixed".  Each reference mutator maps onto a block-structured perturbation of
the table:

- **lens perturbation** (mut_lens.h): exponential screen-space step of the
  image block only.  All BSDF decision blocks are held, so specular /
  glossy chains re-trace through the *same* reflect/refract branches and
  preserved half-vectors — the specular-chain consistency that
  ``mut_manifold.cpp`` restores with Newton iteration falls out of replay
  for free (the batched Newton walk itself lives in
  :mod:`mitsuba_im_tpu.bidir.manifold` and is exercised independently).
- **caustic perturbation** (mut_caustic.h): perturb only the *last*
  bounce's blocks — the tail of the path wiggles across the light while
  the prefix (e.g. the refracting chain into a glass object) is pinned.
- **multi-chain perturbation** (mut_mchain.h): pick a cut bounce k per
  chain, jointly perturb the image block (lens step) and all blocks from
  k on with Kelemen small steps — prefix pinned, suffix regenerated in a
  correlated way.
- **bidirectional mutation** (mut_bidir.h, the ergodicity fallback): a
  fresh independent table = the large step.

Every proposal is symmetric in primary-sample space (additive wrap-around
kernels), so plain Kelemen acceptance ``a = min(1, I'/I)`` is exact — the
transition-density bookkeeping the reference's mutators carry
(``Mutator::Q``) cancels by construction.  The mutation *mixture* is chosen
per chain per step; an ensemble of thousands of chains runs in lockstep,
each step being one fused wavefront re-trace.

Documented deviation: compact caustic islands (tiny lights behind
specular chains) are separated from the rest of primary-sample space by a
near-zero-contribution moat, so chains cross into them only via large
steps — at equal low sample budgets the path tracer's stratified NEE
resolves such caustics with lower error than this (or any
primary-sample-space) MCMC.  The reference closes that gap with
explicit-geometry caustic/manifold perturbations that re-solve the light
connection each proposal (``mut_caustic.cpp``, ``mut_manifold.cpp``).
The batched Newton manifold walk those mutators need already exists here
(:mod:`mitsuba_im_tpu.bidir.manifold`, covered by the path-verification
harness); what is deliberately NOT wired is the Metropolis transition
density of a manifold proposal (the reference's ``Mutator::Q`` with the
manifold-map determinant) — an incorrect Q biases every MLT render,
which is strictly worse than the variance this deviation costs, so the
PSS mixture remains the proposal set until the Q bookkeeping can be
built and verified end to end.
MLT's wins here are hard-visibility *exploration* (once found, a path
family is exploited by perturbation) and robustness at high mutation
budgets.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int
from ..core import rng as mrng
from ..scene.scene import Scene
from .pssmlt import (_draw_table, _eval, _mutate_small, _n_blocks,
                     _splat_px, PSSMLTConfig, pssmlt_init)

U32 = jnp.uint32


@pytree_dataclass
class MLTConfig:
    max_depth: int = static_field(default=8)
    rr_depth: int = static_field(default=5)
    n_chains: int = static_field(default=8192)
    burn_in: int = static_field(default=64)
    p_large: float = static_field(default=0.1)   # bidirectional mutation
    p_lens: float = static_field(default=0.35)
    p_caustic: float = static_field(default=0.2)
    p_mchain: float = static_field(default=0.15)
    # remaining probability: plain Kelemen small step
    s1: float = static_field(default=1.0 / 1024.0)
    s2: float = static_field(default=1.0 / 64.0)
    # lens step radii in normalized screen units (mut_lens.h r1/r2 analog)
    lens_r1: float = static_field(default=0.0002)
    lens_r2: float = static_field(default=0.05)
    # separateDirect (mlt.cpp): plain sampling renders depth<=2, MCMC
    # only the indirect residual
    separate_direct: bool = static_field(default=True)
    direct_samples: int = static_field(default=16)


def _pss_cfg(cfg: MLTConfig) -> PSSMLTConfig:
    return PSSMLTConfig(max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
                        p_large=cfg.p_large, n_chains=cfg.n_chains,
                        burn_in=cfg.burn_in, s1=cfg.s1, s2=cfg.s2,
                        separate_direct=cfg.separate_direct)


def _lens_step(u_img, r, phi):
    """Exponential screen step: u_img (N, 2) in [0,1)^2, wrap-around."""
    off = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
    up = u_img + off
    return up - jnp.floor(up)


def mlt_step_tables(table, u_aux, cfg: MLTConfig, chain, t, seed):
    """Build the proposal table for every chain (mixture of mutators).

    u_aux: (N, 4) mutation-selection uniforms.  Returns (prop, is_large).
    """
    n_blocks = _n_blocks(_pss_cfg(cfg))
    n_iters = max(cfg.max_depth - 1, 0)
    N = table.shape[0]

    fresh = _draw_table(chain, t, seed, n_blocks, stream=1)
    xi = _draw_table(chain, t, seed, n_blocks, stream=2)
    xi_sign = _draw_table(chain, t, seed, n_blocks, stream=3)
    small = _mutate_small(table, xi, xi_sign, cfg.s1, cfg.s2)

    u = u_aux[:, 0]
    p0 = cfg.p_large
    p1 = p0 + cfg.p_lens
    p2 = p1 + cfg.p_caustic
    p3 = p2 + cfg.p_mchain
    is_large = u < p0
    is_lens = (u >= p0) & (u < p1)
    is_caustic = (u >= p1) & (u < p2)
    is_mchain = (u >= p2) & (u < p3)

    # exponential radius r2*exp(-log(r2/r1)*xi) (mut_lens.h sampling)
    r = cfg.lens_r2 * jnp.exp(-jnp.log(cfg.lens_r2 / cfg.lens_r1)
                              * u_aux[:, 1])
    phi = 2.0 * jnp.pi * u_aux[:, 2]
    img_new = _lens_step(table[:, 0, 0:2], r, phi)

    # -- lens: move the image block, pin everything else -------------------
    lens_tab = table.at[:, 0, 0:2].set(img_new)

    # -- caustic: perturb only the last bounce's three blocks --------------
    caustic_tab = table
    if n_iters > 0:
        b0 = 1 + 3 * (n_iters - 1)
        caustic_tab = jnp.concatenate(
            [table[:, :b0], small[:, b0:]], axis=1)

    # -- multi-chain: lens step + small-step suffix from a random bounce ---
    if n_iters > 0:
        kcut = jnp.minimum((u_aux[:, 3] * n_iters).astype(Int), n_iters - 1)
        bcut = 1 + 3 * kcut  # first block of the cut bounce
        bidx = jax.lax.broadcasted_iota(Int, (N, n_blocks), 1)
        suffix = bidx >= bcut[:, None]
        mchain_tab = jnp.where(suffix[..., None], small, table)
        mchain_tab = mchain_tab.at[:, 0, 0:2].set(img_new)
    else:
        mchain_tab = lens_tab

    prop = small
    prop = jnp.where(is_mchain[:, None, None], mchain_tab, prop)
    prop = jnp.where(is_caustic[:, None, None], caustic_tab, prop)
    prop = jnp.where(is_lens[:, None, None], lens_tab, prop)
    prop = jnp.where(is_large[:, None, None], fresh, prop)
    return prop, is_large


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "height", "n_steps", "accumulate"),
    donate_argnames=("img",),
)
def mlt_run(scene: Scene, img: jax.Array, state, seed, step0, *, cfg,
            width, height, n_steps, accumulate):
    """Advance the ensemble by ``n_steps`` Metropolis steps (one jit call)."""
    from ..core.spectrum import luminance  # noqa: F401 (parity w/ pssmlt)

    n = cfg.n_chains
    chain = jnp.arange(n, dtype=U32)
    pss = _pss_cfg(cfg)

    def step(i, carry):
        img, table, pos, color, I, b_sum, b_cnt = carry
        t = step0 + i.astype(U32)
        u_misc = _draw_table(chain, t, seed, 2, stream=4)[:, :, :]
        u_aux = u_misc[:, 0, :]
        prop, is_large = mlt_step_tables(table, u_aux, cfg, chain, t, seed)

        pos_p, color_p, I_p = _eval(scene, prop, pss, width, height)

        b_sum = b_sum + jnp.sum(jnp.where(is_large, I_p, 0.0))
        b_cnt = b_cnt + jnp.sum(is_large.astype(Float))

        a = jnp.where(I > 0, jnp.minimum(1.0, I_p / jnp.maximum(I, 1e-30)),
                      jnp.where(I_p > 0, 1.0, 0.0))

        if accumulate:
            w_cur = jnp.where(I > 0, (1.0 - a) / jnp.maximum(I, 1e-30), 0.0)
            w_prop = jnp.where(I_p > 0, a / jnp.maximum(I_p, 1e-30), 0.0)
            img = _splat_px(img, pos, color, w_cur)
            img = _splat_px(img, pos_p, color_p, w_prop)

        accept = u_misc[:, 1, 0] < a
        table = jnp.where(accept[:, None, None], prop, table)
        pos = jnp.where(accept[:, None], pos_p, pos)
        color = jnp.where(accept[:, None], color_p, color)
        I = jnp.where(accept, I_p, I)
        return img, table, pos, color, I, b_sum, b_cnt

    carry = (img,) + state
    carry = jax.lax.fori_loop(0, n_steps, step, carry)
    return carry[0], carry[1:]


def render_mlt(scene: Scene, settings, spp: int | None = None,
               progress_cb=None) -> np.ndarray:
    """Full MLT render -> (H, W, 3) numpy image (spp = mutations/pixel)."""
    ip = settings.integrator_props
    md = ip.get("max_depth", -1)
    cfg = MLTConfig(
        max_depth=md if md > 0 else 8,
        rr_depth=ip.get("rr_depth", 5),
        n_chains=ip.get("n_chains", 8192),
        burn_in=ip.get("burn_in", 64),
        p_large=ip.get("p_large", 0.1),
        p_lens=ip.get("p_lens", 0.35),
        p_caustic=ip.get("p_caustic", 0.2),
        p_mchain=ip.get("p_mchain", 0.15),
        separate_direct=ip.get("separate_direct", True),
        direct_samples=ip.get("direct_samples", 16),
    )
    W, H = settings.width, settings.height
    spp = spp if spp is not None else settings.spp
    total_mut = W * H * spp
    n_steps = max(total_mut // cfg.n_chains, 1)
    seed = jnp.uint32(settings.seed)

    state = pssmlt_init(scene, seed, cfg=_pss_cfg(cfg), width=W, height=H)
    img = jnp.zeros((H, W, 3), Float)

    burn = min(cfg.burn_in, n_steps // 4) if n_steps > 8 else 0
    if burn:
        img, state = mlt_run(scene, img, state, seed, jnp.uint32(1),
                             cfg=cfg, width=W, height=H, n_steps=burn,
                             accumulate=False)

    chunk = max(min(n_steps - burn, 64), 1)
    done = 0
    remaining = n_steps - burn
    while done < remaining:
        k = min(chunk, remaining - done)
        img, state = mlt_run(
            scene, img, state, seed, jnp.uint32(1 + burn + done),
            cfg=cfg, width=W, height=H, n_steps=k, accumulate=True,
        )
        done += k
        if progress_cb is not None:
            progress_cb(done, remaining, img)

    b_sum, b_cnt = state[4], state[5]
    b = float(b_sum) / max(float(b_cnt), 1.0)
    n_acc = remaining * cfg.n_chains
    scale = b * (W * H) / max(n_acc, 1)
    out = np.asarray(img) * scale

    if cfg.separate_direct and cfg.direct_samples > 0:
        # depth<=2 component with ordinary sampling (mlt.cpp directSamples)
        from ..render.job import render_film
        from ..film.film import develop
        from ..scene.build import RenderSettings

        dset = RenderSettings(
            width=W, height=H, spp=cfg.direct_samples, seed=settings.seed,
            integrator="path",
            integrator_props={"max_depth": 2, "rr_depth": cfg.rr_depth},
            rfilter=settings.rfilter, rfilter_radius=settings.rfilter_radius,
        )
        film = render_film(scene, dset, spp=cfg.direct_samples)
        out = out + np.asarray(develop(film))
    return out
