"""BVH construction and the flat device layout.

Design (SURVEY.md §7): the reference's SAH kd-tree
(``/root/reference/include/mitsuba/render/gkdtree.h:706``) is replaced by a
*threaded BVH*: nodes in depth-first order, each carrying a ``skip`` link to
its subtree's continuation, so device traversal is a stackless while-loop —
per-lane state is a single node index, which maps cleanly onto 8x128 vector
lanes.  Built host-side (C++ binned SAH via :mod:`native`, numpy median-split
fallback) and flattened into HBM-resident arrays.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import pytree_dataclass, static_field, Float, Int
from . import native


@pytree_dataclass
class FlatBVH:
    """Device-resident threaded BVH over the scene's triangle list."""

    node_lo: jax.Array  # (N, 3)
    node_hi: jax.Array  # (N, 3)
    node_start: jax.Array  # (N,) leaf: first index into `order`; inner: -1
    node_count: jax.Array  # (N,) leaf: prim count; inner: 0
    node_skip: jax.Array  # (N,) continuation node (-1 terminates)
    order: jax.Array  # (T,) primitive permutation
    leaf_size: int = static_field(default=4)

    @property
    def n_nodes(self):
        return self.node_lo.shape[0]


def build_bvh_arrays(prim_lo: np.ndarray, prim_hi: np.ndarray,
                     leaf_size: int = 4) -> dict:
    """Host-side build from per-primitive AABBs -> dict of numpy arrays
    (node_lo/node_hi/node_start/node_count/node_skip/order); prefers the
    native SAH builder.  Stays off-device so downstream packing (the
    cluster hierarchy) avoids tunnel round-trips."""
    prim_lo = np.asarray(prim_lo, np.float32)
    prim_hi = np.asarray(prim_hi, np.float32)
    cent = (prim_lo + prim_hi) * 0.5
    out = native.build_bvh_native(prim_lo, prim_hi, cent, leaf_size)
    if out is None:
        out = _build_numpy(prim_lo, prim_hi, cent, leaf_size)
    return out


def build_bvh(prim_lo: np.ndarray, prim_hi: np.ndarray, leaf_size: int = 4) -> FlatBVH:
    """Build from per-primitive AABBs; prefers the native SAH builder."""
    out = build_bvh_arrays(prim_lo, prim_hi, leaf_size)
    return FlatBVH(
        node_lo=jnp.asarray(out["node_lo"], Float),
        node_hi=jnp.asarray(out["node_hi"], Float),
        node_start=jnp.asarray(out["node_start"], Int),
        node_count=jnp.asarray(out["node_count"], Int),
        node_skip=jnp.asarray(out["node_skip"], Int),
        order=jnp.asarray(out["order"], Int),
        leaf_size=leaf_size,
    )


def _build_numpy(prim_lo, prim_hi, cent, leaf_size):
    """Median-split fallback builder (no SAH; correctness-equivalent)."""
    n = len(prim_lo)
    node_lo, node_hi, node_start, node_count, node_skip = [], [], [], [], []
    order = np.arange(n, dtype=np.int32)

    def emit(lo, hi, start, count, far):
        node_lo.append(lo)
        node_hi.append(hi)
        node_start.append(start)
        node_count.append(count)
        node_skip.append(far)
        return len(node_lo) - 1

    def rec(ids, depth):
        lo = prim_lo[ids].min(0)
        hi = prim_hi[ids].max(0)
        if len(ids) <= leaf_size or depth > 60:
            s = rec.cursor
            order[s : s + len(ids)] = ids
            rec.cursor += len(ids)
            return emit(lo, hi, s, len(ids), -2)
        c = cent[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        ordv = np.argsort(c[:, axis], kind="stable")
        m = len(ids) // 2
        me = emit(lo, hi, -1, 0, -1)
        rec(ids[ordv[:m]], depth + 1)
        far = rec(ids[ordv[m:]], depth + 1)
        node_skip[me] = far  # temp: far child; threaded in fixup
        return me

    rec.cursor = 0
    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        rec(np.arange(n), 0)
    finally:
        sys.setrecursionlimit(old)

    node_skip_np = np.asarray(node_skip, np.int32)
    node_count_np = np.asarray(node_count, np.int32)

    def fixup(node, skip):
        while True:
            far = node_skip_np[node]
            if node_count_np[node] > 0 or far == -2:
                node_skip_np[node] = skip
                return
            node_skip_np[node] = skip
            fixup(node + 1, far)
            node = far

    sys.setrecursionlimit(100000)
    try:
        fixup(0, -1)
    finally:
        sys.setrecursionlimit(old)

    return dict(
        node_lo=np.asarray(node_lo, np.float32),
        node_hi=np.asarray(node_hi, np.float32),
        node_start=np.asarray(node_start, np.int32),
        node_count=node_count_np,
        node_skip=node_skip_np,
        order=order,
    )


def tri_bounds(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Per-triangle AABBs from (p0, e1, e2) soup (native-accelerated)."""
    out = native.tri_bounds_native(p0, e1, e2)
    if out is not None:
        return out[0], out[1]
    v0 = np.asarray(p0, np.float32)
    v1 = v0 + np.asarray(e1, np.float32)
    v2 = v0 + np.asarray(e2, np.float32)
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo, hi
