"""Ad-hoc: kernel driver vs XLA driver equality + throughput (not a test)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from bench_scenes import subdivide_midpoint
from mitsuba_im_tpu.scene.mesh import load_ply
from mitsuba_im_tpu.accel import hierarchy as hy
from mitsuba_im_tpu.accel import hier_kernel as hk

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
base = load_ply('/root/reference/data/tests/bunny.ply')
pos, idx = subdivide_midpoint(np.asarray(base.positions),
                              np.asarray(base.indices), rounds=rounds)
p0 = pos[idx[:, 0]].astype(np.float32)
e1 = (pos[idx[:, 1]] - pos[idx[:, 0]]).astype(np.float32)
e2 = (pos[idx[:, 2]] - pos[idx[:, 0]]).astype(np.float32)
h = hy.build_hierarchy(p0, e1, e2)
jax.block_until_ready(h.blocks)
print(f'S={h.n_supers} S_pad={h.swp_lo.shape[1]} C={h.blocks.shape[0]}',
      flush=True)

N = 1 << 19
W = 1 << 10
c = pos.mean(0)
ext = (pos.max(0) - pos.min(0)).max()
eye = c + np.array([0, 0.3 * ext, 2.2 * ext], np.float32)
ii = np.arange(N)
ux = ((ii % W) + 0.5) / W - 0.5
uy = ((ii // W) + 0.5) / (N // W) - 0.5
fwd = (c - eye); fwd /= np.linalg.norm(fwd)
right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
dirs = (fwd[None] + 0.6 * ux[:, None] * right[None]
        + 0.6 * uy[:, None] * up[None]).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
o = jnp.asarray(np.broadcast_to(eye, (N, 3)).copy())
d = jnp.asarray(dirs)
rng = np.random.default_rng(0)
oi = jnp.asarray(c + rng.uniform(-1, 1, (N, 3)).astype(np.float32) * ext)
di_ = rng.normal(size=(N, 3)).astype(np.float32)
di = jnp.asarray(di_ / np.linalg.norm(di_, axis=1, keepdims=True))


@jax.jit
def run_xla(h, o, d):
    return hy.intersect_hierarchy(h, o, d, 1e-4, 1e30, use_kernel=False)


@jax.jit
def run_k(h, o, d):
    return hk.intersect_hier_kernel(h, o, d, 1e-4, 1e30)


@jax.jit
def run_k_any(h, o, d):
    return hk.intersect_hier_kernel(h, o, d, 1e-4, 1e30, any_hit=True)


# equality on a small batch first
ns = 1 << 14
for name, (oo, dd) in [('coh', (o[:ns], d[:ns])), ('inc', (oi[:ns], di[:ns]))]:
    a = jax.tree_util.tree_map(np.asarray, run_xla(h, oo, dd))
    b = jax.tree_util.tree_map(np.asarray, run_k(h, oo, dd))
    same_found = (a['found'] == b['found']).mean()
    m = a['found'] & b['found']
    dt = np.abs(a['t'][m] - b['t'][m]) / np.maximum(a['t'][m], 1e-6)
    same_prim = (a['prim'][m] == b['prim'][m]).mean() if m.any() else 1.0
    print(f'{name}: found agree {same_found:.6f}  prim agree {same_prim:.6f}'
          f'  max rel t {dt.max() if m.any() else 0:.2e}', flush=True)
    c_any = np.asarray(run_k_any(h, oo, dd)['found'])
    print(f'{name}: anyhit vs closest found agree '
          f'{(c_any == a["found"]).mean():.6f}', flush=True)


def bench(fn, tag):
    for name, (oo, dd) in [('coh', (o, d)), ('inc', (oi, di))]:
        r = fn(h, oo, dd)
        float(r['t'].sum())
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            float(fn(h, oo, dd)['t'].sum())
            best = min(best, time.time() - t0)
        print(f'{tag} {name}: {N/best/1e6:.1f} Mrays/s ({best*1e3:.1f} ms)',
              flush=True)


bench(run_k, 'kernel')
bench(run_xla, 'xla   ')
