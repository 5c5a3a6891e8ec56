"""Wavefront MIS path tracer.

Estimator parity with the reference ``path`` plugin
(``/root/reference/src/integrators/path/path.cpp:119-290``): NEE at every
smooth vertex + BSDF sampling, both weighted with the power heuristic
(``miWeight``, path.cpp:292), Russian roulette with eta^2 throughput scaling
from ``rrDepth`` on, ``maxDepth``/``hideEmitters``/``strictNormals``
semantics, environment handling on escape.

TPU design (SURVEY.md §7): instead of a per-pixel recursive ``Li()``, the
integrator advances a flat SoA batch of lanes through a ``lax.fori_loop``
over bounces with masked inactive lanes — static shapes, no divergence
beyond lane masking, everything fused by XLA.  The loop body is wrapped in
``jax.checkpoint`` so reverse-mode differentiation re-runs the wavefront
(path-replay backprop) instead of storing per-bounce intermediates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int, INVALID, EPSILON, SHADOW_EPSILON
from ..core import math as m
from ..core import rng as mrng
from ..bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from ..emitter import table as em
from ..scene.scene import Scene


@pytree_dataclass
class PathConfig:
    max_depth: int = static_field(default=-1)
    rr_depth: int = static_field(default=5)
    hide_emitters: bool = static_field(default=False)
    strict_normals: bool = static_field(default=False)
    depth_budget: int = static_field(default=16)  # cap when max_depth == -1
    remat: bool = static_field(default=True)


def mi_weight(pdf_a, pdf_b):
    """Power heuristic (path.cpp:292)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return m.safe_div(a2, a2 + b2)


def path_li(scene: Scene, sampler: mrng.SamplerState, o: jax.Array,
            d: jax.Array, cfg: PathConfig):
    """Trace a batch of primary rays to completion.

    Returns (radiance (N, 3), sampler) — the sampler is advanced by a fixed
    number of dimensions per bounce so replay is deterministic.
    """
    n = o.shape[0]
    max_depth = cfg.max_depth if cfg.max_depth > 0 else cfg.depth_budget
    n_iters = max(max_depth - 1, 0) if cfg.max_depth > 0 else cfg.depth_budget

    li = jnp.zeros((n, 3), Float)
    thr = jnp.ones((n, 3), Float)

    hit = scene.ray_intersect(o, d)
    it = scene.interaction(o, d, hit)

    # directly visible emitters / environment (depth-1 contributions)
    esc = ~it.valid
    if not cfg.hide_emitters:
        li = li + jnp.where(esc[..., None], thr * em.eval_environment(scene.emitters, d), 0.0)
        eid0 = scene.emitter_at(it)
        le0 = em.emitted_radiance(scene.emitters, eid0, it.ns, -d)
        li = li + jnp.where(it.valid[..., None], thr * le0, 0.0)

    active = it.valid

    state = dict(
        li=li, thr=thr, eta=jnp.ones((n,), Float), active=active,
        scattered=jnp.zeros((n,), bool),
        p=it.p, ns=it.ns, ng=it.ng, ss=it.ss, ts=it.ts_, uv=it.uv,
        shape=it.shape, wi_local=it.wi_local, d_world=d,
        sampler=sampler,
    )

    def bounce(depth_idx, st):
        """One NEE + BSDF-extension step at the current vertex."""
        s = st["sampler"]
        frame = (st["ss"], st["ts"], st["ns"])
        act = st["active"]
        if scene.bsdfs.unwrap_depth > 0:
            s, sel_blk = mrng.next_block4(s)
            bparams = scene.bsdf_at(_fake_it(st), u_sel=sel_blk[..., 0])
        else:
            bparams = scene.bsdf_at(_fake_it(st))

        # --- subsurface scattering (its.LoSub analog) ----------------------
        st_li0 = st["li"]
        if scene.subsurface is not None:
            from ..subsurface import eval_lo

            ss_id = scene.subsurface_at(st["shape"], act)
            lo_sub = eval_lo(scene.subsurface, st["p"],
                             jnp.abs(st["wi_local"][..., 2]), ss_id)
            st_li0 = st_li0 + jnp.where(act[..., None], st["thr"] * lo_sub, 0.0)

        # --- next-event estimation (sampleEmitterDirect, path.cpp:176) ----
        s, nee_blk = mrng.next_block4(s)
        ds = em.sample_direct(
            scene.emitters, scene.geom, st["p"], nee_blk[..., 0], nee_blk[..., 1:3]
        )
        wo_local_nee = m.Frame.to_local(frame, ds.d)
        f_nee = bsdf_eval(bparams, st["wi_local"], wo_local_nee)
        pdf_bsdf_nee = bsdf_pdf(bparams, st["wi_local"], wo_local_nee)
        can_nee = act & (ds.pdf > 0) & (jnp.sum(f_nee, axis=-1) > 0)
        shadow_o = st["p"]
        occ = scene.occluded(
            shadow_o, ds.d, EPSILON, ds.dist * (1.0 - SHADOW_EPSILON)
        )
        w_nee = jnp.where(ds.delta, 1.0, mi_weight(ds.pdf, pdf_bsdf_nee))
        contrib = st["thr"] * ds.value * f_nee * m.safe_div(w_nee, ds.pdf)[..., None]
        st_li = st_li0 + jnp.where((can_nee & ~occ)[..., None], contrib, 0.0)

        # --- BSDF sampling (path.cpp:211) ---------------------------------
        s, bsdf_blk = mrng.next_block4(s)
        bs = bsdf_sample(bparams, st["wi_local"], bsdf_blk[..., 0],
                         bsdf_blk[..., 1:3], bsdf_blk[..., 3])
        wo_world = m.Frame.to_world(frame, bs.wo)
        thr_new = st["thr"] * bs.weight
        dead = jnp.sum(thr_new, axis=-1) <= 0
        act2 = act & ~dead
        scattered = st["scattered"] | (act & ~bs.null_passthrough)
        eta_new = st["eta"] * bs.eta

        # extend the path
        o2 = st["p"]
        hit2 = scene.ray_intersect(o2, wo_world)
        it2 = scene.interaction(o2, wo_world, hit2)

        # emitter hit / environment with MIS (path.cpp:249-266)
        eid2 = scene.emitter_at(it2)
        le2 = em.emitted_radiance(scene.emitters, eid2, it2.ns, -wo_world)
        lum_pdf_area = em.pdf_direct_area(
            scene.emitters, eid2, st["p"], it2.p, it2.ns
        )
        esc2 = ~it2.valid
        env_val = em.eval_environment(scene.emitters, wo_world)
        env_pdf = em.pdf_direct_env(scene.emitters, wo_world)

        lum_pdf = jnp.where(bs.delta, 0.0, jnp.where(esc2, env_pdf, lum_pdf_area))
        w_bsdf = mi_weight(bs.pdf, lum_pdf)
        hit_val = jnp.where(esc2[..., None], env_val, le2)
        hide = cfg.hide_emitters & ~scattered
        st_li = st_li + jnp.where(
            (act2 & ~hide)[..., None], thr_new * hit_val * w_bsdf[..., None], 0.0
        )

        act3 = act2 & it2.valid

        # --- Russian roulette (path.cpp:276-290) ---------------------------
        depth = depth_idx + 1  # reference depth counter before increment
        s, rr_blk = mrng.next_block4(s)
        u_rr = rr_blk[..., 0]
        q = jnp.minimum(
            jnp.max(thr_new, axis=-1) * eta_new * eta_new, 0.95
        )
        do_rr = depth >= cfg.rr_depth
        kill = do_rr & (u_rr >= q)
        thr_new = jnp.where(
            (do_rr & ~kill)[..., None], thr_new / jnp.maximum(q, 1e-6)[..., None], thr_new
        )
        act3 = act3 & ~kill

        return dict(
            li=st_li, thr=thr_new, eta=eta_new, active=act3, scattered=scattered,
            p=it2.p, ns=it2.ns, ng=it2.ng, ss=it2.ss, ts=it2.ts_, uv=it2.uv,
            shape=it2.shape, wi_local=it2.wi_local, d_world=wo_world,
            sampler=s,
        )

    body = bounce
    if cfg.remat:
        body = jax.checkpoint(bounce, prevent_cse=False)
    state = jax.lax.fori_loop(0, n_iters, body, state)
    return state["li"], state["sampler"]


def _fake_it(st):
    """Adapter: scene.bsdf_at consumes an Interaction-shaped object."""
    from ..scene.geometry import Interaction

    return Interaction(
        p=st["p"], t=jnp.zeros(st["p"].shape[:-1], Float), ng=st["ng"],
        ns=st["ns"], ss=st["ss"], ts_=st["ts"], uv=st["uv"],
        wi_local=st["wi_local"], shape=st["shape"], valid=st["active"],
    )
