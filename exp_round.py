"""Ad-hoc: kernel round cost + while-iteration count (not a test)."""
import time, sys
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

M = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 15)
rng = np.random.default_rng(0)
c = pos.mean(0)
ext = (pos.max(0) - pos.min(0)).max()
o = jnp.asarray(c + rng.uniform(-1, 1, (M, 3)).astype(np.float32) * ext)
d_ = rng.normal(size=(M, 3)).astype(np.float32)
d = jnp.asarray(d_ / np.linalg.norm(d_, axis=1, keepdims=True))
tmin = jnp.full((M,), 1e-4, Float)
tmax = jnp.full((M,), 1e30, Float)
swp = hk._swp_packed(h)

K = 32


@jax.jit
def run_rounds(h, swp, o, d):
    ST = hk._make_state(h, o, d, tmin, tmax)
    ST = jax.lax.fori_loop(
        0, K, lambda i, st: hk._round(h, swp, st, any_hit=False), ST)
    return ST[:, 0]


@jax.jit
def run_gathers(h, o, d):
    """Just the two row gathers, K times."""
    cid0 = jnp.arange(M, dtype=Int)

    def body(i, acc):
        cid = (cid0 * 7 + i) % h.blocks.shape[0]
        sid = (cid0 + i) % h.childs.shape[0]
        BR = h.blocks[cid]
        CR = h.childs[sid]
        return acc + BR[:, 0] + CR[:, 0]

    return jax.lax.fori_loop(0, K, body, jnp.zeros((M,), Float))


@jax.jit
def run_kernel_only(h, swp, o, d):
    """Kernel on fixed rows (row 0 broadcast: gather is cache-friendly)."""
    ST = hk._make_state(h, o, d, tmin, tmax)
    zero = jnp.zeros((M,), Int)
    BR = h.blocks[zero]
    CR = h.childs[zero]
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    S_pad = swp.shape[1]
    kern = functools.partial(hk._step_kernel, n_chunks=S_pad // hk.LANES,
                             any_hit=False)

    def body(i, st):
        return pl.pallas_call(
            kern, grid=(M // hk.TILE,),
            in_specs=[
                pl.BlockSpec((8, S_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hk.TILE, hk.NC), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hk.TILE, hy.ROW), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hk.TILE, hy.CROW), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((hk.TILE, hk.NC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, hk.NC), jnp.float32),
        )(swp, st, BR, CR)

    ST = jax.lax.fori_loop(0, K, body, ST)
    return ST[:, 0]


@jax.jit
def count_iters(h, swp, o, d):
    ST = hk._make_state(h, o, d, tmin, tmax)

    def cond(c):
        return jnp.any(hk._ib(c[0][:, hk.C_ACT]) > 0)

    def body(c):
        st, n = c
        return hk._round(h, swp, st, any_hit=False), n + 1

    st, n = jax.lax.while_loop(cond, body, (ST, 0))
    return n * jnp.ones((1,), Int)


def t(name, fn, *a):
    r = fn(*a)
    float(jnp.asarray(r).sum())
    best = 1e30
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.asarray(fn(*a)).sum())
        best = min(best, time.perf_counter() - t0)
    print(f'{name}: {best*1e3/K:.3f} ms/round ({best*1e3:.1f} total)',
          flush=True)


print(f'M={M}', flush=True)
t('full round  ', run_rounds, h, swp, o, d)
t('gathers only', run_gathers, h, o, d)
t('kernel only ', run_kernel_only, h, swp, o, d)
print('while-iters (full-width run):', int(count_iters(h, swp, o, d)[0]),
      flush=True)


def make_variant(**flags):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    S_pad = swp.shape[1]
    kern = functools.partial(hk._step_kernel, n_chunks=S_pad // hk.LANES,
                             any_hit=False, **flags)

    @jax.jit
    def run(h, swp, o, d):
        ST = hk._make_state(h, o, d, tmin, tmax)
        zero = jnp.zeros((M,), Int)
        BR = h.blocks[zero]
        CR = h.childs[zero]

        def body(i, st):
            return pl.pallas_call(
                kern, grid=(M // hk.TILE,),
                in_specs=[
                    pl.BlockSpec((8, S_pad), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((hk.TILE, hk.NC), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((hk.TILE, hy.ROW), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((hk.TILE, hy.CROW), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((hk.TILE, hk.NC), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, hk.NC), jnp.float32),
            )(swp, st, BR, CR)

        ST = jax.lax.fori_loop(0, K, body, ST)
        return ST[:, 0]

    return run


t('k mt only   ', make_variant(do_child=False, do_sweep=False), h, swp, o, d)
t('k child only', make_variant(do_mt=False, do_sweep=False), h, swp, o, d)
t('k sweep only', make_variant(do_mt=False, do_child=False), h, swp, o, d)
t('k mt+child  ', make_variant(do_sweep=False), h, swp, o, d)
