"""Ad-hoc: front-size / k_inner sweep for the hierarchy driver (not a test)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from bench_scenes import subdivide_midpoint
from mitsuba_im_tpu.scene.mesh import load_ply
from mitsuba_im_tpu.accel import hierarchy as hy

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
base = load_ply('/root/reference/data/tests/bunny.ply')
pos, idx = subdivide_midpoint(np.asarray(base.positions),
                              np.asarray(base.indices), rounds=rounds)
p0 = pos[idx[:, 0]].astype(np.float32)
e1 = (pos[idx[:, 1]] - pos[idx[:, 0]]).astype(np.float32)
e2 = (pos[idx[:, 2]] - pos[idx[:, 0]]).astype(np.float32)
h = hy.build_hierarchy(p0, e1, e2)
jax.block_until_ready(h.blocks)
print(f'S={h.n_supers} C={h.blocks.shape[0]} tris={len(idx)}', flush=True)

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


def bench(front, k_inner):
    @jax.jit
    def run(h, o, d):
        st = hy.intersect_hierarchy(h, o, d, 1e-4, 1e30,
                                    front=front, k_inner=k_inner)
        return st['t'].sum(), st['found'].sum()

    for name, (oo, dd) in [('coh', (o, d)), ('inc', (oi, di))]:
        s, f = run(h, oo, dd)
        float(s)
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            float(run(h, oo, dd)[0])
            best = min(best, time.time() - t0)
        print(f'front={front//1024}K k={k_inner} {name}: '
              f'{N/best/1e6:.1f} Mrays/s ({best*1e3:.1f} ms)', flush=True)


for front in (1 << 13, 1 << 14, 1 << 15):
    for k in (1, 2, 4):
        bench(front, k)
