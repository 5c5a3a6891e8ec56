"""Irradiance caching (reference ``src/integrators/misc/irrcache*.cpp``).

The reference populates an octree of irradiance records during a pre-pass
(hemisphere-sampled irradiance + harmonic-mean distance per record,
``librender/irrcache.cpp``) and interpolates them with Ward's weighting at
render time.  TPU-native reframe: records live in flat SoA arrays and the
interpolation is a *dense* (pixels x records) weighted gather — a regular,
compiler-tileable computation that replaces the octree's pointer chasing
(the record count is a few thousand, so the dense product is cheap on the
MXU/VPU while staying exact: every record is considered for every pixel,
no tree-pruning approximation).

Pipeline:
1. cache placement: primary rays on a stride-k pixel grid -> surface hits
   become cache records (the analog of the reference's camera-driven
   record placement);
2. per record: cosine-hemisphere sampling of the path integrator with
   ``hide_emitters`` estimates *indirect* irradiance E_i (direct light
   renders analytically in the final pass, so no double counting); the
   harmonic mean of sample hit distances gives the validity radius R_i
   (Ward & Heckbert 1988);
3. final render: per pixel, Ward weights w_i = 1/(|p-p_i|/R_i +
   sqrt(1-n.n_i)) blend records with w_i > 1/quality; emitters and one-
   sample NEE direct lighting render normally, the cache supplies the
   indirect diffuse component.

Like the reference, this is an approximation designed for diffuse-dominant
scenes (records ignore glossy directionality).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import Float, EPSILON, SHADOW_EPSILON
from ..core import math as m
from ..core import rng as mrng
from ..sampler import KIND_BY_NAME
from ..sensor.table import sample_ray
from ..emitter import table as em


@functools.partial(jax.jit, static_argnames=("n_samples", "max_depth"))
def _estimate_irradiance(scene, p, ns, ss, ts, valid, seed, *, n_samples,
                         max_depth):
    """Hemisphere-sample indirect incident radiance at M cache points.

    Returns (E (M, 3), R_harmonic (M,)): indirect irradiance and the
    harmonic-mean hit distance (the Ward validity radius)."""
    from .path import PathConfig, path_li

    M = p.shape[0]
    # hide_emitters drops the depth-1 (direct) term of each hemisphere ray,
    # leaving exactly the indirect irradiance integrand
    cfg = PathConfig(max_depth=max_depth, depth_budget=max_depth,
                     hide_emitters=True, coherent=False)
    o = p + ns * EPSILON

    def one(i, carry):
        E, inv_d = carry
        rid = jnp.arange(M, dtype=jnp.uint32)
        sampler = mrng.make_sampler(rid, i.astype(jnp.uint32), seed)
        sampler, blk = mrng.next_block4(sampler)
        d_local = jnp.stack(
            [jnp.sqrt(blk[..., 0]) * jnp.cos(2 * jnp.pi * blk[..., 1]),
             jnp.sqrt(blk[..., 0]) * jnp.sin(2 * jnp.pi * blk[..., 1]),
             jnp.sqrt(jnp.maximum(1.0 - blk[..., 0], 0.0))], axis=-1)
        d_world = m.Frame.to_world((ss, ts, ns), d_local)
        li, _ = path_li(scene, sampler, o, d_world, cfg)
        E = E + jnp.where(valid[..., None], li, 0.0)
        hit = scene.ray_intersect(o, d_world)
        inv_d = inv_d + jnp.where(
            valid & hit.valid, 1.0 / jnp.maximum(hit.t, 1e-3), 0.0)
        return E, inv_d

    E = jnp.zeros((M, 3), Float)
    inv_d = jnp.zeros((M,), Float)
    E, inv_d = jax.lax.fori_loop(0, n_samples, one, (E, inv_d))
    # cosine-weighted estimator of irradiance: E = pi * mean(Li)
    E = E * (jnp.pi / n_samples)
    R = jnp.where(inv_d > 0, n_samples / jnp.maximum(inv_d, 1e-6), 1e6)
    # Clamp the validity radius to the scene scale: records whose hemisphere
    # rays all miss get an "accept everywhere" sentinel, but an unbounded R
    # must never size the hash grid (one giant cell would collapse every
    # record into a few buckets and GRID_CAP would silently drop most of
    # them).  The reference likewise bounds R by the scene AABB
    # (/root/reference/src/libcore/... irrcache R in [minDist, maxDist]).
    r_scene = jnp.maximum(scene.emitters.bsphere_radius, 1e-3)
    R = jnp.clip(R, 1e-4, r_scene)
    return E, R


DENSE_MAX = 1024   # below this record count the exact dense product wins
K_DENSE = 256      # largest-R records always evaluated densely
GRID_CAP = 64      # records visited per neighbor cell (27-cell query)


def _ward_accum(p, ns, cp, cn, cE, cR, cvalid, quality, acc):
    """Accumulate Ward weights for one candidate record per query lane."""
    w_acc, E_acc, dmin, E_near = acc
    d = jnp.linalg.norm(p - cp, axis=-1)
    ndot = jnp.clip(jnp.sum(ns * cn, -1), -1.0, 1.0)
    w = 1.0 / (d / jnp.maximum(cR, 1e-4)
               + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0)) + 1e-6)
    ok = (w > 1.0 / quality) & cvalid & (ndot > 0.1)
    w = jnp.where(ok, w, 0.0)
    near_ok = cvalid & (ndot > 0.0)
    d_n = jnp.where(near_ok, d, jnp.inf)
    better = d_n < dmin
    return (w_acc + w, E_acc + w[..., None] * cE,
            jnp.where(better, d_n, dmin),
            jnp.where(better[..., None], cE, E_near))


def _gather_cache(p, ns, rec_p, rec_n, rec_E, rec_R, rec_valid, quality,
                  grid=None):
    """Ward interpolation over the record set.

    Dense (N, M) evaluation for small caches; for large ones a **hybrid
    hash-grid cull** (the reference octree's job,
    ``/root/reference/src/librender/irrcache.cpp`` lookup): records are
    split by validity radius — the ``K_DENSE`` largest-R records (whose
    reach can span the scene, e.g. sky-facing records with harmonic-mean
    distance ~inf) stay dense-exact, while the compact majority live in a
    27-neighborhood spatial hash with cell = quality * max R of the grid
    side, which conservatively bounds the Ward acceptance radius
    d < quality * R.  Query cost drops from O(N*M) to
    O(N * (K_DENSE + 27 * GRID_CAP)) — sub-quadratic in the cache size
    (the same sort-based-grid design as the dipole's culled gather,
    subsurface/__init__.py).
    """
    if grid is None:
        d = jnp.linalg.norm(p[:, None, :] - rec_p[None, :, :], axis=-1)
        ndot = jnp.clip(jnp.einsum("nc,mc->nm", ns, rec_n), -1.0, 1.0)
        w = 1.0 / (d / jnp.maximum(rec_R[None, :], 1e-4)
                   + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0)) + 1e-6)
        ok = (w > 1.0 / quality) & rec_valid[None, :] & (ndot > 0.1)
        w = jnp.where(ok, w, 0.0)
        wsum = jnp.sum(w, axis=1)
        E = jnp.einsum("nm,mc->nc", w, rec_E) \
            / jnp.maximum(wsum, 1e-9)[..., None]
        # fallback: nearest valid record when no record qualifies
        d_masked = jnp.where(rec_valid[None, :] & (ndot > 0.0), d, jnp.inf)
        nearest = jnp.argmin(d_masked, axis=1)
        E_near = rec_E[nearest]
        return jnp.where((wsum > 0)[..., None], E, E_near)

    from .sppm import _cell_hash

    N = p.shape[0]
    M = rec_p.shape[0]
    dense_ids, order, bucket, cell = grid

    # dense part: the few long-reach records, one batched (N, K) product
    dp, dn = rec_p[dense_ids], rec_n[dense_ids]
    dE, dR = rec_E[dense_ids], rec_R[dense_ids]
    dv = rec_valid[dense_ids]
    d = jnp.linalg.norm(p[:, None, :] - dp[None, :, :], axis=-1)
    ndot = jnp.clip(jnp.einsum("nc,kc->nk", ns, dn), -1.0, 1.0)
    w = 1.0 / (d / jnp.maximum(dR[None, :], 1e-4)
               + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0)) + 1e-6)
    ok = (w > 1.0 / quality) & dv[None, :] & (ndot > 0.1)
    w = jnp.where(ok, w, 0.0)
    d_n = jnp.where(dv[None, :] & (ndot > 0.0), d, jnp.inf)
    near_k = jnp.argmin(d_n, axis=1)
    acc = (jnp.sum(w, axis=1), jnp.einsum("nk,kc->nc", w, dE),
           jnp.min(d_n, axis=1), dE[near_k])

    # grid part: 27-neighborhood, up to GRID_CAP records per cell
    base = jnp.floor(p / cell).astype(jnp.int32)
    offs = jnp.asarray(
        [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32)
    cc = base[None, :, :] + offs[:, None, :]
    b = _cell_hash(cc)                        # (27, N)
    starts = jnp.searchsorted(bucket, b, side="left")
    ends = jnp.searchsorted(bucket, b, side="right")
    runs = jnp.minimum(ends - starts, GRID_CAP)

    def body(j, acc):
        ci = j // GRID_CAP
        k = j % GRID_CAP
        st = jax.lax.dynamic_index_in_dim(starts, ci, 0, keepdims=False)
        rn = jax.lax.dynamic_index_in_dim(runs, ci, 0, keepdims=False)
        idx = jnp.minimum(st + k, M - 1)
        ri = order[idx]
        live = (k < rn)
        return _ward_accum(p, ns, rec_p[ri], rec_n[ri], rec_E[ri],
                           rec_R[ri], rec_valid[ri] & live, quality, acc)

    acc = jax.lax.fori_loop(0, 27 * GRID_CAP, body, acc)
    wsum, E_acc, _dmin, E_near = acc
    E = E_acc / jnp.maximum(wsum, 1e-9)[..., None]
    return jnp.where((wsum > 0)[..., None], E, E_near)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "spp", "kind", "seed"))
def _final_pass(scene, rec_p, rec_n, rec_E, rec_R, rec_valid, quality,
                sample_idx, grid=None, *, width, height, spp, kind, seed):
    from ..bsdf.eval import bsdf_eval

    W, H = width, height
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    s = mrng.make_sampler(pix, sample_idx, jnp.uint32(seed), kind=kind,
                          spp=spp)
    s, blk0 = mrng.next_block4(s)
    jitter, u_lens = blk0[..., :2], blk0[..., 2:4]
    uvp = (jnp.stack([(pix % W).astype(Float), (pix // W).astype(Float)], -1)
           + jitter) / jnp.asarray([W, H], Float)
    o, dr, _ws = sample_ray(scene.sensor, uvp, u_lens)
    hitp = scene.ray_intersect(o, dr)
    itp = scene.interaction(o, dr, hitp)

    # emitted + escaped
    li = jnp.where((~itp.valid)[..., None],
                   em.eval_environment(scene.emitters, dr), 0.0)
    eid = scene.emitter_at(itp)
    li = li + jnp.where(
        itp.valid[..., None],
        em.emitted_radiance(scene.emitters, eid, itp.ns, -dr), 0.0)

    # direct lighting (one NEE sample)
    bparams = scene.bsdf_at(itp)
    s, nee = mrng.next_block4(s)
    ds = em.sample_direct(scene.emitters, scene.geom, itp.p,
                          nee[..., 0], nee[..., 1:3])
    wo_local = itp.to_local(ds.d)
    f = bsdf_eval(bparams, itp.wi_local, wo_local)
    occ = scene.occluded(itp.p, ds.d, EPSILON,
                         ds.dist * (1.0 - SHADOW_EPSILON))
    can = itp.valid & (ds.pdf > 0) & ~occ
    li = li + jnp.where(
        can[..., None],
        ds.value * f / jnp.maximum(ds.pdf, 1e-9)[..., None], 0.0)

    # indirect diffuse from the cache
    E_px = _gather_cache(itp.p, itp.ns, rec_p, rec_n, rec_E, rec_R,
                         rec_valid, quality, grid=grid)
    li = li + jnp.where(itp.valid[..., None],
                        bparams.refl * E_px / jnp.pi, 0.0)
    return li


def render_irrcache(scene, settings, spp=None):
    """Irradiance-cached render -> (H, W, 3) numpy image."""
    ip = settings.integrator_props
    quality = float(ip.get("quality", 1.0))
    stride = int(ip.get("resolution", 4))  # cache-point pixel stride
    n_hemi = int(ip.get("irr_samples", 64))
    nested = dict(ip.get("nested", {"name": "path"}))
    max_depth = int(nested.get("max_depth", 3))

    W, H = settings.width, settings.height
    spp = int(spp if spp is not None else settings.spp)
    kind = KIND_BY_NAME.get(settings.sampler, mrng.INDEPENDENT)

    # --- cache placement + irradiance estimation ---------------------------
    gx = np.arange(stride // 2, W, stride)
    gy = np.arange(stride // 2, H, stride)
    pix_rec = (gy[:, None] * W + gx[None, :]).reshape(-1).astype(np.uint32)
    rid = jnp.asarray(pix_rec)
    sampler = mrng.make_sampler(rid, jnp.uint32(0), jnp.uint32(settings.seed))
    _, blk = mrng.next_block4(sampler)
    uv = (jnp.stack([(rid % W).astype(Float), (rid // W).astype(Float)], -1)
          + 0.5) / jnp.asarray([W, H], Float)
    o, d, _w = sample_ray(scene.sensor, uv, blk[..., 2:4])
    hit = scene.ray_intersect(o, d)
    it = scene.interaction(o, d, hit)
    E_ind, R = _estimate_irradiance(
        scene, it.p, it.ns, it.ss, it.ts_, it.valid,
        jnp.uint32(settings.seed + 1), n_samples=n_hemi, max_depth=max_depth)

    grid = None
    M = int(pix_rec.shape[0])
    if M > DENSE_MAX:
        # hybrid hash-grid cull (see _gather_cache): long-reach records
        # dense, the compact majority in a spatial hash whose cell bounds
        # the Ward acceptance radius
        from .sppm import build_grid

        R_h = np.asarray(R)
        valid_h = np.asarray(it.valid)
        order_R = np.argsort(np.where(valid_h, -R_h, np.inf))
        dense_ids = np.sort(order_R[:K_DENSE]).astype(np.int32)
        in_dense = np.zeros(M, bool)
        in_dense[dense_ids] = True
        grid_mask = valid_h & ~in_dense
        r_grid = R_h[grid_mask]
        r_max = float(r_grid.max()) if r_grid.size else 1.0
        cell = max(quality * r_max, 1e-4)
        g_order, g_bucket = build_grid(
            jnp.asarray(np.asarray(it.p)),
            jnp.asarray(grid_mask), jnp.asarray(cell, Float))
        grid = (jnp.asarray(dense_ids), g_order, g_bucket,
                jnp.asarray(cell, Float))

    acc = 0.0
    for si in range(spp):
        acc = acc + _final_pass(
            scene, it.p, it.ns, E_ind, R, it.valid,
            jnp.asarray(quality, Float), jnp.uint32(si), grid,
            width=W, height=H, spp=spp, kind=kind, seed=settings.seed)
    img = np.asarray(acc / spp).reshape(H, W, 3)
    return np.nan_to_num(img, nan=0.0, posinf=0.0, neginf=0.0)
