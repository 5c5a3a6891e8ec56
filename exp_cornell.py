"""Ad-hoc: Cornell forward decomposition, differenced timing (not a test)."""
import time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from __graft_entry__ import _tiny_cornell
from mitsuba_im_tpu.core import rng as mrng
from mitsuba_im_tpu.core.types import Float
from mitsuba_im_tpu.integrators.path import PathConfig, path_li_v
from mitsuba_im_tpu.sensor.table import sample_ray_v
from mitsuba_im_tpu.accel import pallas_intersect as pk
from mitsuba_im_tpu.emitter import table as em
from mitsuba_im_tpu.bsdf.eval import bsdf_eval_v, bsdf_pdf_v, bsdf_sample_v
from mitsuba_im_tpu.core import v3 as v

scene, _settings = _tiny_cornell()
W = H = 1024
n = W * H
tri_rep = pk.replicate_tris(scene.geom)


def rays(s):
    pix = jnp.arange(n, dtype=jnp.uint32)
    sampler = mrng.make_sampler_v(pix, s, jnp.uint32(0))
    sampler, blk0 = mrng.next_block4_v(sampler)
    uu = ((pix % W).astype(Float) + blk0[0]) / W
    vv = ((pix // W).astype(Float) + blk0[1]) / H
    o, d, _w = sample_ray_v(scene.sensor, uu, vv, blk0[2], blk0[3])
    return sampler, o, d


def diff_time(make_body, k_lo=4, k_hi=20):
    def scanner(K):
        @jax.jit
        def run():
            def body(acc, s):
                return acc + make_body(s), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(K, dtype=jnp.uint32))
            return acc
        return run

    lo, hi = scanner(k_lo), scanner(k_hi)
    float(lo()); float(hi())
    best = 1e30
    for _ in range(4):
        t0 = time.perf_counter(); float(hi()); th = time.perf_counter() - t0
        t0 = time.perf_counter(); float(lo()); tl = time.perf_counter() - t0
        best = min(best, (th - tl) / (k_hi - k_lo))
    return best


def P(name, fn):
    t = diff_time(fn)
    print(f'{name}: {t*1e3:.3f} ms', flush=True)
    return t


cfg = PathConfig(max_depth=5, remat=False)
P('full pass          ', lambda s: path_li_v(scene, *(lambda sp, o, d: (sp, o, d))(*rays(s)), cfg)[0].sum().sum()
  if False else path_li_v(scene, rays(s)[0], rays(s)[1], rays(s)[2], cfg)[0].sum().sum())
P('raygen             ', lambda s: rays(s)[2].x.sum())


def closest(s):
    _, o, d = rays(s)
    t, u, vv_, i, hit = pk.closest_tris_v(
        tri_rep, o, d, jnp.zeros((n,), Float), jnp.full((n,), 3e37, Float))
    return t.sum()


def anyhit(s):
    _, o, d = rays(s)
    hb = pk.anyhit_tris_v(tri_rep, o, d, jnp.zeros((n,), Float),
                          jnp.full((n,), 1.0, Float))
    return hb.sum()


def nee(s):
    _, o, d = rays(s)
    pix = jnp.arange(n, dtype=jnp.uint32)
    sp = mrng.make_sampler_v(pix, s, jnp.uint32(1))
    sp, blk = mrng.next_block4_v(sp)
    ds = em.sample_direct_v(scene.emitters, scene.geom, o, blk[0], blk[1],
                            blk[2])
    return ds.pdf.sum() + ds.value.x.sum()


def bsdf_pair(s):
    sp, o, d = rays(s)
    it = scene.interaction_v(o, d, scene.ray_intersect_v(o, d))
    bp = scene.bsdf_at_v(it)
    sp, blk = mrng.next_block4_v(sp)
    f = bsdf_eval_v(bp, it.wi_local, d)
    pdf = bsdf_pdf_v(bp, it.wi_local, d)
    bs = bsdf_sample_v(bp, it.wi_local, blk[0], blk[1], blk[2], blk[3])
    return f.x.sum() + pdf.sum() + bs.wo.z.sum() + bs.weight.x.sum()


def interaction_only(s):
    _, o, d = rays(s)
    it = scene.interaction_v(o, d, scene.ray_intersect_v(o, d))
    return it.p.x.sum() + it.wi_local.z.sum()


def rng13(s):
    pix = jnp.arange(n, dtype=jnp.uint32)
    sp = mrng.make_sampler_v(pix, s, jnp.uint32(0))
    tot = jnp.float32(0.0)
    for _ in range(13):
        sp, blk = mrng.next_block4_v(sp)
        tot = tot + blk[0].sum()
    return tot


P('closest (rg incl)  ', closest)
P('anyhit  (rg incl)  ', anyhit)
P('NEE sample_direct  ', nee)
P('interaction (rg+cl)', interaction_only)
P('bsdf e+p+s (rg+it) ', bsdf_pair)
P('rng 13 blocks      ', rng13)
