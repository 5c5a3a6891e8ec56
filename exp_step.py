"""Ad-hoc: per-round cost decomposition of the hierarchy driver (not a test)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from bench_scenes import subdivide_midpoint
from mitsuba_im_tpu.scene.mesh import load_ply
from mitsuba_im_tpu.accel import hierarchy as hy
from mitsuba_im_tpu.core.types import Float, Int

base = load_ply('/root/reference/data/tests/bunny.ply')
pos, idx = subdivide_midpoint(np.asarray(base.positions),
                              np.asarray(base.indices), rounds=2)
p0 = pos[idx[:, 0]].astype(np.float32)
e1 = (pos[idx[:, 1]] - pos[idx[:, 0]]).astype(np.float32)
e2 = (pos[idx[:, 2]] - pos[idx[:, 0]]).astype(np.float32)
h = hy.build_hierarchy(p0, e1, e2)
jax.block_until_ready(h.blocks)
print(f'S={h.n_supers} S_pad={h.swp_lo.shape[1]} C={h.blocks.shape[0]}',
      flush=True)

M = 1 << 13
rng = np.random.default_rng(0)
c = pos.mean(0)
ext = (pos.max(0) - pos.min(0)).max()
o = jnp.asarray(c + rng.uniform(-1, 1, (M, 3)).astype(np.float32) * ext)
d_ = rng.normal(size=(M, 3)).astype(np.float32)
d = jnp.asarray(d_ / np.linalg.norm(d_, axis=1, keepdims=True))
tmin = jnp.full((M,), 1e-4, Float)
tmax = jnp.full((M,), 1e30, Float)


def timeit(name, fn, *args, reps=5):
    r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, 'block_until_ready')
        else x, r)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).sum())
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).sum())
        best = min(best, time.perf_counter() - t0)
    print(f'{name}: {best*1e3:.3f} ms', flush=True)
    return best


K = 64  # rounds per timed call


@jax.jit
def run_steps(h, o, d):
    st = hy._make_state(h, o, d, tmin, tmax)
    d_safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / d_safe
    zc = jnp.zeros((M, hy.SUP), Float)

    def body(i, c):
        st, zc = c
        st, zc = hy._one_step(h, st, inv_d, zc, False, fresh=False)
        return st, zc

    st, zc = jax.lax.fori_loop(0, K, body, (st, zc))
    return st['t']


@jax.jit
def run_sweep(h, o, d):
    st = hy._make_state(h, o, d, tmin, tmax)
    d_safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / d_safe

    def body(i, acc):
        se, sid = hy._nearest_super(h, o, inv_d, tmin, st['t'],
                                    st['sg_t'] + acc * 0, st['sg_c'])
        return acc + se

    return jax.lax.fori_loop(0, K, body, jnp.zeros((M,), Float))


@jax.jit
def run_mt(h, o, d):
    """Gather + MT only (fixed cluster ids, no sweep/centry)."""
    cid0 = jnp.arange(M, dtype=Int) % h.blocks.shape[0]

    def body(i, acc):
        cid = (cid0 + i) % h.blocks.shape[0]
        row = h.blocks[cid]
        comp = [row[:, c * hy.LEAF:(c + 1) * hy.LEAF] for c in range(9)]
        p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = comp
        olx, oly, olz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dlx, dly, dlz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        pvx = dly * e2z - dlz * e2y
        pvy = dlz * e2x - dlx * e2z
        pvz = dlx * e2y - dly * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tvx = olx - p0x
        tvy = oly - p0y
        tvz = olz - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dlx * qvx + dly * qvy + dlz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hitm = ((jnp.abs(det) > 1e-12) & (uu >= 0) & (vv >= 0)
                & (uu + vv <= 1) & (tt > 1e-4))
        return acc + jnp.min(jnp.where(hitm, tt, 1e30), axis=1)

    return jax.lax.fori_loop(0, K, body, jnp.zeros((M,), Float))


@jax.jit
def run_driver_noop(h, o, d):
    """Pack/sort/refill machinery only (state untouched by steps)."""
    st = hy._make_state(h, o, d, tmin, tmax)
    P = hy._pack_state(st)
    resq = jnp.zeros((M * 2, hy._NRES), Float)

    def body(i, c):
        P, resq = c
        key = jax.lax.bitcast_convert_type(P[:, 0], Int) & 3
        perm = jnp.argsort(key, stable=True)
        Pf = P[perm]
        resq = jax.lax.dynamic_update_slice(resq, Pf[:, :hy._NRES], (i, 0))
        return Pf, resq

    P, resq = jax.lax.fori_loop(0, K, body, (P, resq))
    return resq[:, 0]


# count driver rounds for the real intersect at this front
@jax.jit
def count_rounds(h, o, d):
    state = hy._make_state(h, o, d, tmin, tmax)
    zc = jnp.zeros((M, hy.SUP), Float)

    def cond(c):
        return jnp.any(c[0]['active'])

    def body(c):
        st, zc, n = c
        st, zc = hy._run_front(h, st, False, hy.K_INNER, centry=zc)
        return st, zc, n + 1

    st, zc, n = jax.lax.while_loop(cond, body, (state, zc, 0))
    return n * jnp.ones((1,), Int)


print('--- all at M=8K, K=64 rounds per call ---', flush=True)
t_all = timeit('64x full step  ', run_steps, h, o, d)
t_sw = timeit('64x sweep only ', run_sweep, h, o, d)
t_mt = timeit('64x gather+MT  ', run_mt, h, o, d)
t_dr = timeit('64x driver noop', run_driver_noop, h, o, d)
n = int(count_rounds(h, o, d)[0])
print(f'while-rounds for one 8K front batch: {n}', flush=True)
