"""Participating media tables + phase functions.

Parity targets: ``/root/reference/src/medium/homogeneous.cpp`` (closed-form
transmittance + distance sampling), ``heterogeneous.cpp`` (grid-density
media with unbiased free-flight sampling; the reference integrates density
with composite Simpson or samples via its ray-marching scheme — the TPU
build uses **delta/Woodcock tracking** for distance sampling and **ratio
tracking** for transmittance, both branch-free bounded loops over the whole
lane batch), phase functions ``isotropic``/``hg``/``rayleigh``
(``src/phase/``), and the attenuated shadow-ray capability
(``Scene::sampleAttenuatedEmitterDirect``).

Heterogeneous model (heterogeneous.cpp:110-115): sigma_t(x) = scale *
density(x) — spectrally uniform — and sigma_s(x) = sigma_t(x) * albedo(x).
Because sigma_t is gray, delta tracking is *exact*: every accepted
tentative collision is a real collision with weight albedo(x), and
escaping to the surface carries weight 1 (transmittance and pdf cancel).
Density grids live in one flat HBM atlas; per-medium rows store the
offset/resolution/world-to-voxel affine and the majorant.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int, INVALID
from ..core import math as m
from ..core.math import Frame, vec3, safe_sqrt

PH_ISOTROPIC = 0
PH_HG = 1
PH_RAYLEIGH = 2

INV_FOURPI = 1.0 / (4.0 * jnp.pi)


MAX_TRACK_STEPS = 2048  # safety bound on tracking collisions per segment


@pytree_dataclass
class MediumTable:
    sigma_s: jax.Array  # (M, 3) homogeneous scattering coeff (0 for hetero)
    sigma_a: jax.Array  # (M, 3)
    sigma_t: jax.Array  # (M, 3)
    phase_type: jax.Array  # (M,)
    g: jax.Array  # (M,) HG asymmetry
    # -- heterogeneous grid media ------------------------------------------
    hetero: jax.Array  # (M,) int32 0/1
    majorant: jax.Array  # (M,) max sigma_t over the grid (scale folded in)
    grid_offset: jax.Array  # (M,) int32 into density_atlas
    grid_res: jax.Array  # (M, 3) int32 (nx, ny, nz)
    w2g: jax.Array  # (M, 12) rows of world->voxel affine
    albedo_c: jax.Array  # (M, 3) constant single-scattering albedo
    alb_offset: jax.Array  # (M,) int32 into albedo_atlas, -1 = constant
    alb_res: jax.Array  # (M, 3) int32
    alb_w2g: jax.Array  # (M, 12)
    density_atlas: jax.Array  # (D,) f32 sigma_t values (scale * density)
    albedo_atlas: jax.Array  # (A, 3) f32
    n_media: int = static_field(default=0)
    used_phase: tuple = static_field(default=())
    has_hetero: bool = static_field(default=False)

    @property
    def any(self):
        return self.n_media > 0


def _pack_grid(atlas: list, rec: dict) -> tuple[int, np.ndarray, np.ndarray]:
    """Append a grid record's data to the atlas list; returns
    (offset, res[3], w2g rows[12])."""
    from .volume import grid_world_to_voxel

    data = np.asarray(rec["data"], np.float32)
    zres, yres, xres, _ = data.shape
    off = sum(a.size for a in atlas)
    atlas.append(data.reshape(-1, data.shape[-1]))
    m = grid_world_to_voxel(rec)[:3, :]  # 3x4 rows
    return off, np.asarray([xres, yres, zres], np.int32), m.reshape(12)


def build_media(records: list[dict]) -> MediumTable:
    recs = records or [dict(sigma_s=np.zeros(3), sigma_a=np.zeros(3), scale=1.0,
                            phase=dict(type=PH_ISOTROPIC, g=0.0))]
    M = len(recs)
    ss = np.zeros((M, 3))
    sa = np.zeros((M, 3))
    pt = np.asarray([r.get("phase", {}).get("type", PH_ISOTROPIC) for r in recs], np.int32)
    g = np.asarray([r.get("phase", {}).get("g", 0.0) for r in recs], np.float64)

    hetero = np.zeros(M, np.int32)
    majorant = np.zeros(M, np.float64)
    goff = np.zeros(M, np.int32)
    gres = np.ones((M, 3), np.int32)
    w2g = np.tile(np.eye(4)[:3, :].reshape(12), (M, 1))
    alb_c = np.full((M, 3), 0.8)
    aoff = np.full(M, -1, np.int32)
    ares = np.ones((M, 3), np.int32)
    aw2g = np.tile(np.eye(4)[:3, :].reshape(12), (M, 1))
    d_atlas: list = []
    a_atlas: list = []

    for i, r in enumerate(recs):
        scale = r.get("scale", 1.0)
        if r.get("kind") == "heterogeneous":
            dg = r.get("density")
            if dg is None:
                continue
            dg = dict(dg)
            dg["data"] = np.asarray(dg["data"], np.float32)[..., :1] * scale
            hetero[i] = 1
            majorant[i] = float(dg["data"].max(initial=0.0))
            goff[i], gres[i], w2g[i] = _pack_grid(d_atlas, dg)
            ag = r.get("albedo")
            if ag is not None:
                adata = np.asarray(ag["data"], np.float32)
                if adata.shape[-1] == 1:
                    adata = np.repeat(adata, 3, axis=-1)
                if ag.get("const") or adata.size <= 3:
                    alb_c[i] = adata.reshape(-1, 3)[0]
                else:
                    ag = dict(ag, data=adata)
                    aoff[i], ares[i], aw2g[i] = _pack_grid(a_atlas, ag)
        else:
            ss[i] = np.asarray(r["sigma_s"], np.float64) * scale
            sa[i] = np.asarray(r["sigma_a"], np.float64) * scale

    dens = (np.concatenate(d_atlas, axis=0)[:, 0] if d_atlas
            else np.zeros(1, np.float32))
    alb = (np.concatenate(a_atlas, axis=0) if a_atlas
           else np.zeros((1, 3), np.float32))
    return MediumTable(
        sigma_s=jnp.asarray(ss, Float), sigma_a=jnp.asarray(sa, Float),
        sigma_t=jnp.asarray(ss + sa, Float),
        phase_type=jnp.asarray(pt, Int), g=jnp.asarray(g, Float),
        hetero=jnp.asarray(hetero, Int), majorant=jnp.asarray(majorant, Float),
        grid_offset=jnp.asarray(goff, Int), grid_res=jnp.asarray(gres, Int),
        w2g=jnp.asarray(w2g, Float),
        albedo_c=jnp.asarray(alb_c, Float),
        alb_offset=jnp.asarray(aoff, Int), alb_res=jnp.asarray(ares, Int),
        alb_w2g=jnp.asarray(aw2g, Float),
        density_atlas=jnp.asarray(dens, Float),
        albedo_atlas=jnp.asarray(alb, Float),
        n_media=len(records),
        used_phase=tuple(sorted(set(int(x) for x in pt))),
        has_hetero=bool(hetero.any()),
    )


def medium_params(media: MediumTable, mid: jax.Array):
    """Per-lane (sigma_s, sigma_t, phase_type, g); vacuum for INVALID."""
    from ..core.gather import RowBundle

    idx = jnp.where(mid == INVALID, 0, mid)
    b = (
        RowBundle()
        .add("sigma_s", media.sigma_s).add("sigma_t", media.sigma_t)
        .add("phase_type", media.phase_type).add("g", media.g)
    ).lookup(idx)
    vac = (mid == INVALID)[..., None]
    return (
        jnp.where(vac, 0.0, b["sigma_s"]),
        jnp.where(vac, 0.0, b["sigma_t"]),
        b["phase_type"],
        b["g"],
    )


def hetero_rows(media: MediumTable, mid: jax.Array) -> dict:
    """Per-lane heterogeneous-medium rows (vacuum-safe)."""
    from ..core.gather import RowBundle

    idx = jnp.where(mid == INVALID, 0, mid)
    b = (
        RowBundle()
        .add("hetero", media.hetero).add("majorant", media.majorant)
        .add("grid_res", media.grid_res)
        .add("w2g", media.w2g)
        .add("albedo_c", media.albedo_c)
        .add("alb_res", media.alb_res)
        .add("alb_w2g", media.alb_w2g)
    ).lookup(idx)
    # atlas offsets can exceed 2^24: keep them exact int gathers, not the
    # f32-packed bundle
    b["grid_offset"] = media.grid_offset[idx]
    b["alb_offset"] = media.alb_offset[idx]
    b["is_het"] = (mid != INVALID) & (b["hetero"] > 0)
    return b


def _trilinear(atlas, offset, res, w2g, p):
    """Trilinear grid lookup. atlas (D,) or (D,C); offset (n,), res (n,3)
    int, w2g (n,12) affine rows; p (n,3) world points. Zero outside."""
    rows = w2g.reshape(w2g.shape[:-1] + (3, 4))
    gpt = jnp.einsum("...ij,...j->...i", rows[..., :3], p) + rows[..., 3]
    resf = res.astype(Float)
    inside = jnp.all((gpt >= 0.0) & (gpt <= resf - 1.0 + 1e-4), axis=-1)
    gc = jnp.clip(gpt, 0.0, jnp.maximum(resf - 1.0, 0.0))
    i0 = jnp.floor(gc).astype(Int)
    i0 = jnp.minimum(i0, jnp.maximum(res - 2, 0))
    f = gc - i0.astype(Float)
    i1 = jnp.minimum(i0 + 1, res - 1)
    nx, ny = res[..., 0], res[..., 1]

    def at(ix, iy, iz):
        flat = offset + ((iz * ny + iy) * nx + ix)
        return atlas[flat]

    def lerp(a, b, t):
        if a.ndim > t.ndim:
            t = t[..., None]
        return a + (b - a) * t

    x0, x1 = i0[..., 0], i1[..., 0]
    y0, y1 = i0[..., 1], i1[..., 1]
    z0, z1 = i0[..., 2], i1[..., 2]
    c00 = lerp(at(x0, y0, z0), at(x1, y0, z0), f[..., 0])
    c10 = lerp(at(x0, y1, z0), at(x1, y1, z0), f[..., 0])
    c01 = lerp(at(x0, y0, z1), at(x1, y0, z1), f[..., 0])
    c11 = lerp(at(x0, y1, z1), at(x1, y1, z1), f[..., 0])
    c0 = lerp(c00, c10, f[..., 1])
    c1 = lerp(c01, c11, f[..., 1])
    val = lerp(c0, c1, f[..., 2])
    if val.ndim > inside.ndim:
        inside = inside[..., None]
    return jnp.where(inside, val, 0.0)


def sigma_t_at(media: MediumTable, rows: dict, p: jax.Array) -> jax.Array:
    """Heterogeneous sigma_t (= scale*density, gray) at world points."""
    return _trilinear(media.density_atlas, rows["grid_offset"],
                      rows["grid_res"], rows["w2g"], p)


def albedo_at(media: MediumTable, rows: dict, p: jax.Array) -> jax.Array:
    """Single-scattering albedo at world points; constant fallback."""
    grid = _trilinear(media.albedo_atlas, jnp.maximum(rows["alb_offset"], 0),
                      rows["alb_res"], rows["alb_w2g"], p)
    return jnp.where((rows["alb_offset"] >= 0)[..., None], grid, rows["albedo_c"])


def track_distance(media: MediumTable, rows: dict, o, d, t_max, s, active):
    """Delta/Woodcock tracking through heterogeneous lanes.

    Returns (sampler, t_event, scattered).  Exact because sigma_t is gray
    (heterogeneous.cpp model): accepted collisions carry weight albedo(x),
    escapes carry weight 1.
    """
    from ..core import rng as mrng

    n = o.shape[0]
    maj = jnp.maximum(rows["majorant"], 1e-20)
    live0 = active & rows["is_het"] & (rows["majorant"] > 1e-20)

    def cond(st):
        i, s_, t, live, sc = st
        return (i < MAX_TRACK_STEPS) & jnp.any(live)

    def body(st):
        i, s_, t, live, sc = st
        s_, blk = mrng.next_block4(s_)
        step = -jnp.log1p(-jnp.minimum(blk[..., 0], 0.999999)) / maj
        t2 = t + step
        esc = t2 >= t_max
        p = o + d * t2[..., None]
        dens = sigma_t_at(media, rows, p)
        accept = blk[..., 1] < dens / maj
        sc = sc | (live & ~esc & accept)
        t = jnp.where(live, jnp.minimum(t2, t_max), t)
        live = live & ~esc & ~accept
        return (i + 1, s_, t, live, sc)

    init = (jnp.zeros((), Int), s, jnp.zeros((n,), Float), live0,
            jnp.zeros((n,), bool))
    _, s, t, _, scattered = jax.lax.while_loop(cond, body, init)
    return s, t, scattered


def track_transmittance(media: MediumTable, rows: dict, o, d, dist, s, active):
    """Ratio tracking: unbiased transmittance estimate along shadow
    segments through heterogeneous lanes. Returns (sampler, T scalar)."""
    from ..core import rng as mrng

    n = o.shape[0]
    maj = jnp.maximum(rows["majorant"], 1e-20)
    live0 = active & rows["is_het"] & (rows["majorant"] > 1e-20)

    def cond(st):
        i, s_, t, T, live = st
        return (i < MAX_TRACK_STEPS) & jnp.any(live)

    def body(st):
        i, s_, t, T, live = st
        s_, blk = mrng.next_block4(s_)
        step = -jnp.log1p(-jnp.minimum(blk[..., 0], 0.999999)) / maj
        t2 = t + step
        esc = t2 >= dist
        p = o + d * t2[..., None]
        dens = sigma_t_at(media, rows, p)
        T = jnp.where(live & ~esc, T * (1.0 - dens / maj), T)
        t = jnp.where(live, t2, t)
        live = live & ~esc & (T > 1e-6)
        return (i + 1, s_, t, T, live)

    init = (jnp.zeros((), Int), s, jnp.zeros((n,), Float),
            jnp.ones((n,), Float), live0)
    _, s, _, T, live = jax.lax.while_loop(cond, body, init)
    T = jnp.where(live, 0.0, jnp.maximum(T, 0.0))  # budget exceeded: opaque
    return s, T


def transmittance(sigma_t: jax.Array, dist: jax.Array) -> jax.Array:
    """Homogeneous Beer-Lambert transmittance; (..., 3)."""
    return jnp.exp(-sigma_t * jnp.minimum(dist, 1e30)[..., None])


def sample_distance(sigma_t: jax.Array, u: jax.Array):
    """Channel-averaged free-flight sampling.

    Returns (t, pdf_continue(t), pdf_surface = P[t' > t_surf]-density form):
    callers compare t with the surface distance; weights follow the
    standard homogeneous estimator (homogeneous.cpp sampleDistance).
    """
    st_bar = jnp.maximum(jnp.mean(sigma_t, axis=-1), 1e-20)
    t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / st_bar
    return t, st_bar


# ---------------------------------------------------------------------------
# Component-SoA API (canonical for the wavefront hot path)
# ---------------------------------------------------------------------------

def medium_params_v(media: MediumTable, mid: jax.Array):
    """SoA per-lane (sigma_s V3, sigma_t V3, phase_type, g)."""
    from ..core import v3 as v

    idx = jnp.where(mid == INVALID, 0, mid)
    vac = mid == INVALID
    z = jnp.zeros(mid.shape, Float)
    zero = v.V3(z, z, z)
    ss = v.where(vac, zero, v.gather_v3(media.sigma_s, idx))
    st = v.where(vac, zero, v.gather_v3(media.sigma_t, idx))
    return ss, st, v.gather_col(media.phase_type, idx), v.gather_col(media.g, idx)


def hetero_rows_v(media: MediumTable, mid: jax.Array) -> dict:
    """SoA heterogeneous rows: affines as 12 flat columns."""
    from ..core import v3 as v

    idx = jnp.where(mid == INVALID, 0, mid)
    b = dict(
        hetero=v.gather_col(media.hetero, idx),
        majorant=v.gather_col(media.majorant, idx),
        grid_res=tuple(v.gather_col(media.grid_res[:, k], idx) for k in range(3)),
        w2g=tuple(v.gather_col(media.w2g[:, k], idx) for k in range(12)),
        albedo_c=v.gather_v3(media.albedo_c, idx),
        alb_res=tuple(v.gather_col(media.alb_res[:, k], idx) for k in range(3)),
        alb_w2g=tuple(v.gather_col(media.alb_w2g[:, k], idx) for k in range(12)),
        grid_offset=media.grid_offset[idx],
        alb_offset=media.alb_offset[idx],
    )
    b["is_het"] = (mid != INVALID) & (b["hetero"] > 0)
    return b


def _trilinear_v(atlas, offset, res, w2g, p, vec_out: bool):
    """SoA trilinear grid lookup: res/w2g are column tuples, p is V3."""
    from ..core import v3 as v

    r = w2g
    gx = r[0] * p.x + r[1] * p.y + r[2] * p.z + r[3]
    gy = r[4] * p.x + r[5] * p.y + r[6] * p.z + r[7]
    gz = r[8] * p.x + r[9] * p.y + r[10] * p.z + r[11]
    nx, ny, nz = res
    fx = nx.astype(Float) - 1.0
    fy = ny.astype(Float) - 1.0
    fz = nz.astype(Float) - 1.0
    inside = ((gx >= 0.0) & (gx <= fx + 1e-4) & (gy >= 0.0)
              & (gy <= fy + 1e-4) & (gz >= 0.0) & (gz <= fz + 1e-4))
    gx = jnp.clip(gx, 0.0, jnp.maximum(fx, 0.0))
    gy = jnp.clip(gy, 0.0, jnp.maximum(fy, 0.0))
    gz = jnp.clip(gz, 0.0, jnp.maximum(fz, 0.0))
    x0 = jnp.minimum(jnp.floor(gx).astype(Int), jnp.maximum(nx - 2, 0))
    y0 = jnp.minimum(jnp.floor(gy).astype(Int), jnp.maximum(ny - 2, 0))
    z0 = jnp.minimum(jnp.floor(gz).astype(Int), jnp.maximum(nz - 2, 0))
    tx = gx - x0.astype(Float)
    ty = gy - y0.astype(Float)
    tz = gz - z0.astype(Float)
    x1 = jnp.minimum(x0 + 1, nx - 1)
    y1 = jnp.minimum(y0 + 1, ny - 1)
    z1 = jnp.minimum(z0 + 1, nz - 1)

    def at(ix, iy, iz):
        flat = offset + ((iz * ny + iy) * nx + ix)
        if vec_out:
            return v.V3.from_array(atlas[flat])
        return atlas[flat]

    def lerp(a, b, t):
        return a + (b - a) * t

    c00 = lerp(at(x0, y0, z0), at(x1, y0, z0), tx)
    c10 = lerp(at(x0, y1, z0), at(x1, y1, z0), tx)
    c01 = lerp(at(x0, y0, z1), at(x1, y0, z1), tx)
    c11 = lerp(at(x0, y1, z1), at(x1, y1, z1), tx)
    val = lerp(lerp(c00, c10, ty), lerp(c01, c11, ty), tz)
    if vec_out:
        return v.where(inside, val, v.V3(jnp.zeros_like(gx),
                                         jnp.zeros_like(gx),
                                         jnp.zeros_like(gx)))
    return jnp.where(inside, val, 0.0)


def sigma_t_at_v(media: MediumTable, rows: dict, p) -> jax.Array:
    return _trilinear_v(media.density_atlas, rows["grid_offset"],
                        rows["grid_res"], rows["w2g"], p, vec_out=False)


def albedo_at_v(media: MediumTable, rows: dict, p):
    from ..core import v3 as v

    grid = _trilinear_v(media.albedo_atlas, jnp.maximum(rows["alb_offset"], 0),
                        rows["alb_res"], rows["alb_w2g"], p, vec_out=True)
    return v.where(rows["alb_offset"] >= 0, grid, rows["albedo_c"])


def track_distance_v(media: MediumTable, rows: dict, o, d, t_max, s, active):
    """SoA delta/Woodcock tracking; o, d are V3, sampler is Sampler3."""
    from ..core import rng as mrng

    n = o.x.shape[0]
    maj = jnp.maximum(rows["majorant"], 1e-20)
    live0 = active & rows["is_het"] & (rows["majorant"] > 1e-20)

    def cond(st):
        i, s_, t, live, sc = st
        return (i < MAX_TRACK_STEPS) & jnp.any(live)

    def body(st):
        i, s_, t, live, sc = st
        s_, blk = mrng.next_block4_v(s_)
        step = -jnp.log1p(-jnp.minimum(blk[0], 0.999999)) / maj
        t2 = t + step
        esc = t2 >= t_max
        p = o + d * t2
        dens = sigma_t_at_v(media, rows, p)
        accept = blk[1] < dens / maj
        sc = sc | (live & ~esc & accept)
        t = jnp.where(live, jnp.minimum(t2, t_max), t)
        live = live & ~esc & ~accept
        return (i + 1, s_, t, live, sc)

    init = (jnp.zeros((), Int), s, jnp.zeros((n,), Float), live0,
            jnp.zeros((n,), bool))
    _, s, t, _, scattered = jax.lax.while_loop(cond, body, init)
    return s, t, scattered


def track_transmittance_v(media: MediumTable, rows: dict, o, d, dist, s,
                          active):
    """SoA ratio tracking; returns (sampler, T scalar)."""
    from ..core import rng as mrng

    n = o.x.shape[0]
    maj = jnp.maximum(rows["majorant"], 1e-20)
    live0 = active & rows["is_het"] & (rows["majorant"] > 1e-20)

    def cond(st):
        i, s_, t, T, live = st
        return (i < MAX_TRACK_STEPS) & jnp.any(live)

    def body(st):
        i, s_, t, T, live = st
        s_, blk = mrng.next_block4_v(s_)
        step = -jnp.log1p(-jnp.minimum(blk[0], 0.999999)) / maj
        t2 = t + step
        esc = t2 >= dist
        p = o + d * t2
        dens = sigma_t_at_v(media, rows, p)
        T = jnp.where(live & ~esc, T * (1.0 - dens / maj), T)
        t = jnp.where(live, t2, t)
        live = live & ~esc & (T > 1e-6)
        return (i + 1, s_, t, T, live)

    init = (jnp.zeros((), Int), s, jnp.zeros((n,), Float),
            jnp.ones((n,), Float), live0)
    _, s, _, T, live = jax.lax.while_loop(cond, body, init)
    T = jnp.where(live, 0.0, jnp.maximum(T, 0.0))  # budget exceeded: opaque
    return s, T


def transmittance_v(sigma_t, dist):
    """SoA Beer-Lambert; sigma_t V3, dist (N,) -> V3."""
    d = jnp.minimum(dist, 1e30)
    return (sigma_t * (-d)).exp()


def sample_distance_v(sigma_t, u: jax.Array):
    """SoA channel-averaged free flight: sigma_t V3 -> (t, st_bar)."""
    st_bar = jnp.maximum(sigma_t.mean(), 1e-20)
    t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / st_bar
    return t, st_bar


def phase_eval_v(ptype, g, wi, wo):
    """SoA p(wi -> wo); wi, wo are V3."""
    cos_theta = (-wi).dot(wo)
    iso = jnp.full(cos_theta.shape, INV_FOURPI)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    hg = INV_FOURPI * (1.0 - g * g) / jnp.maximum(
        denom * safe_sqrt(denom), 1e-8)
    ray = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)
    out = iso
    out = jnp.where(ptype == PH_HG, hg, out)
    out = jnp.where(ptype == PH_RAYLEIGH, ray, out)
    return out


def phase_sample_v(ptype, g, wi, u1, u2):
    """SoA phase sampling; returns (wo V3, pdf)."""
    from ..core import v3 as v

    wo_iso = v.square_to_uniform_sphere(u1, u2)

    safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_hg = (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    cos_hg = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u1, cos_hg)
    cos_hg = jnp.clip(cos_hg, -1.0, 1.0)
    sin_hg = safe_sqrt(1.0 - cos_hg * cos_hg)
    phi = 2.0 * jnp.pi * u2
    frame = v.frame_from_normal(-wi)
    wo_hg = v.to_world(
        frame, v.V3(sin_hg * jnp.cos(phi), sin_hg * jnp.sin(phi), cos_hg))

    z = 2.0 * (2.0 * u1 - 1.0)
    A = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    cos_r = jnp.clip(A - 1.0 / A, -1.0, 1.0)
    sin_r = safe_sqrt(1.0 - cos_r * cos_r)
    wo_ray = v.to_world(
        frame, v.V3(sin_r * jnp.cos(phi), sin_r * jnp.sin(phi), cos_r))

    wo = wo_iso
    wo = v.where(ptype == PH_HG, wo_hg, wo)
    wo = v.where(ptype == PH_RAYLEIGH, wo_ray, wo)
    return wo, phase_eval_v(ptype, g, wi, wo)


# ---------------------------------------------------------------------------
# Phase functions (local frame: wi toward previous vertex, like BSDFs)
# ---------------------------------------------------------------------------

def phase_eval(ptype, g, wi, wo):
    """p(wi -> wo), normalized over the sphere."""
    cos_theta = m.dot(-wi, wo)  # angle from the propagation direction
    iso = jnp.full(cos_theta.shape, INV_FOURPI)

    # HG: forward-peaked for g > 0 (theta = 0 -> (1-g)^3 denominator)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    hg = INV_FOURPI * (1.0 - g * g) / jnp.maximum(denom * safe_sqrt(denom), 1e-8)

    ray = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)

    out = iso
    out = jnp.where(ptype == PH_HG, hg, out)
    out = jnp.where(ptype == PH_RAYLEIGH, ray, out)
    return out


def phase_sample(ptype, g, wi, u2):
    """Sample wo; returns (wo, pdf). HG exact inverse-CDF; isotropic uniform;
    Rayleigh exact via Cardano cubic inversion (phase/rayleigh.cpp)."""
    from ..core import warp

    # isotropic
    wo_iso = warp.square_to_uniform_sphere(u2)

    # Henyey-Greenstein
    safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    cos_hg = (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    cos_hg = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u2[..., 0], cos_hg)
    cos_hg = jnp.clip(cos_hg, -1.0, 1.0)
    sin_hg = safe_sqrt(1.0 - cos_hg * cos_hg)
    phi = 2.0 * jnp.pi * u2[..., 1]
    frame = Frame.from_normal(-wi)
    wo_hg = Frame.to_world(
        frame, vec3(sin_hg * jnp.cos(phi), sin_hg * jnp.sin(phi), cos_hg)
    )

    # Rayleigh: invert u = (3x + x^3 + 4)/8 for x = cos
    z = 2.0 * (2.0 * u2[..., 0] - 1.0)
    A = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    cos_r = jnp.clip(A - 1.0 / A, -1.0, 1.0)
    sin_r = safe_sqrt(1.0 - cos_r * cos_r)
    wo_ray = Frame.to_world(
        frame, vec3(sin_r * jnp.cos(phi), sin_r * jnp.sin(phi), cos_r)
    )

    wo = wo_iso
    wo = jnp.where((ptype == PH_HG)[..., None], wo_hg, wo)
    wo = jnp.where((ptype == PH_RAYLEIGH)[..., None], wo_ray, wo)
    pdf = phase_eval(ptype, g, wi, wo)
    return wo, pdf
