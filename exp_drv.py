"""Ad-hoc: driver round counts + per-phase timing for the v2 kernel."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp

from bench_scenes import subdivide_midpoint
from mitsuba_im_tpu.scene.mesh import load_ply
from mitsuba_im_tpu.accel import hierarchy as hy
from mitsuba_im_tpu.accel import hier_kernel as hk
from mitsuba_im_tpu.core.types import Float, Int

base = load_ply('/root/reference/data/tests/bunny.ply')
pos, idx = subdivide_midpoint(np.asarray(base.positions),
                              np.asarray(base.indices), rounds=2)
p0 = pos[idx[:, 0]].astype(np.float32)
e1 = (pos[idx[:, 1]] - pos[idx[:, 0]]).astype(np.float32)
e2 = (pos[idx[:, 2]] - pos[idx[:, 0]]).astype(np.float32)
h = hy.build_hierarchy(p0, e1, e2)
jax.block_until_ready(h.blocks)

N = 1 << 19
rng = np.random.default_rng(0)
c = pos.mean(0)
ext = (pos.max(0) - pos.min(0)).max()
W = 1 << 10
ii = np.arange(N)
ux = ((ii % W) + 0.5) / W - 0.5
uy = ((ii // W) + 0.5) / (N // W) - 0.5
eye = c + np.array([0, 0.3 * ext, 2.2 * ext], np.float32)
fwd = (c - eye); fwd /= np.linalg.norm(fwd)
right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
dirs = (fwd[None] + 0.6 * ux[:, None] * right[None]
        + 0.6 * uy[:, None] * up[None]).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
o = jnp.asarray(np.broadcast_to(eye, (N, 3)).copy())
d = jnp.asarray(dirs)
oi = jnp.asarray(c + rng.uniform(-1, 1, (N, 3)).astype(np.float32) * ext)
di_ = rng.normal(size=(N, 3)).astype(np.float32)
di = jnp.asarray(di_ / np.linalg.norm(di_, axis=1, keepdims=True))

M = int(sys.argv[1]) if len(sys.argv) > 1 else hk.KFRONT
R = int(sys.argv[2]) if len(sys.argv) > 2 else hk.R_INNER


@jax.jit
def drv_stats(h, o, d):
    """Copy of the compaction driver with iteration/active counters."""
    tmin = jnp.full((N,), 1e-4, Float)
    tmax = jnp.full((N,), 1e30, Float)
    swp = hk._swp_packed(h)
    childs = hk._childs_resident(h)
    ST = hk._make_state(h, o, d, tmin, tmax)

    act0 = hk._ib(ST[:, hk.C_ACT]) > 0
    perm0 = jnp.argsort(~act0, stable=True)
    P = ST[perm0]
    n_act = jnp.sum(act0.astype(Int))
    P = jnp.concatenate([P, jnp.zeros((M, hk.NC), jnp.float32)], axis=0)
    resq = jnp.zeros((N + M, hk.NRES), jnp.float32)
    slot = jnp.arange(M, dtype=Int)
    TOMB = jnp.asarray(N, Int)

    def cond(carry):
        fr = carry[0]
        return jnp.any(hk._ib(fr[:, hk.C_ACT]) > 0)

    def body(carry):
        fr, tail, cursor, resq, it, actsum = carry
        for _ in range(R):
            actsum = actsum + jnp.sum(
                (hk._ib(fr[:, hk.C_ACT]) > 0).astype(Int))
            fr = hk._round2(h, swp, childs, fr, any_hit=False)
            it = it + 1
        retired = ~(hk._ib(fr[:, hk.C_ACT]) > 0)
        tomb = hk._ib(fr[:, hk.C_IDX]) >= N
        key = jnp.where(retired, jnp.where(tomb, 1, 0), 2)
        permf = jnp.argsort(key, stable=True)
        Pf = fr[permf]
        n_real = jnp.sum((retired & ~tomb).astype(Int))
        n_ret = jnp.sum(retired.astype(Int))
        resq = jax.lax.dynamic_update_slice(resq, Pf[:, :hk.NRES],
                                            (cursor, 0))
        take_new = slot < n_ret
        have_ray = tail + slot < n_act
        Pref = jax.lax.dynamic_slice(P, (tail, 0), (M, hk.NC))
        fr2 = jnp.where(take_new[:, None], Pref, Pf)
        is_tomb_new = take_new & ~have_ray
        fr2 = fr2.at[:, hk.C_IDX].set(
            jnp.where(is_tomb_new, hk._fb(TOMB), fr2[:, hk.C_IDX]))
        fr2 = fr2.at[:, hk.C_ACT].set(jnp.where(
            is_tomb_new, hk._fb(jnp.zeros((), Int)), fr2[:, hk.C_ACT]))
        fr2 = fr2.at[:, hk.C_FOUND].set(jnp.where(
            is_tomb_new, hk._fb(jnp.zeros((), Int)), fr2[:, hk.C_FOUND]))
        tail2 = tail + jnp.minimum(n_ret, jnp.maximum(n_act - tail, 0))
        return fr2, tail2, cursor + n_real, resq, it, actsum

    carry = (P[:M], jnp.asarray(M, Int), jnp.asarray(0, Int), resq,
             jnp.asarray(0, Int), jnp.asarray(0, Int))
    fr, tail, cursor, resq, it, actsum = jax.lax.while_loop(
        cond, body, carry)
    return it, actsum, n_act


for name, (oo, dd) in [('coh', (o, d)), ('inc', (oi, di))]:
    it, actsum, n_act = [int(x) for x in drv_stats(h, oo, dd)]
    print(f'{name}: M={M} R={R} rounds={it} n_act0={n_act} '
          f'lane-rounds={it*M} active-lane-rounds={actsum} '
          f'act-frac={actsum/max(it*M,1):.2f} '
          f'active-rounds/ray={actsum/max(n_act,1):.2f}', flush=True)
