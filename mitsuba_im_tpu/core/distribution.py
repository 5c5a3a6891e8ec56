"""Discrete 1D/2D distributions for importance sampling.

Reference: ``/root/reference/include/mitsuba/core/pmf.h:35``
(DiscreteDistribution) and the hierarchical 2D CDF inside the envmap emitter.
Device-side sampling is a vectorized ``searchsorted`` (binary search maps
fine onto TPU vector lanes as a fori_loop of compares).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .types import Float, pytree_dataclass


@pytree_dataclass
class Distribution1D:
    """Normalized CDF table over N entries.

    ``cdf`` has N+1 entries, cdf[0] = 0, cdf[N] = 1.  ``pmf`` is the
    normalized probability per entry; ``integral`` the pre-normalization sum.
    """

    pmf: jax.Array  # (N,)
    cdf: jax.Array  # (N+1,)
    integral: jax.Array  # ()

    @staticmethod
    def from_weights(w) -> "Distribution1D":
        w = jnp.asarray(w, Float)
        total = jnp.sum(w)
        safe = jnp.where(total > 0, total, 1.0)
        pmf = jnp.where(total > 0, w / safe, jnp.ones_like(w) / w.shape[0])
        cdf = jnp.concatenate([jnp.zeros((1,), Float), jnp.cumsum(pmf)])
        # Force exact closure so sample() never falls off the end.
        cdf = cdf.at[-1].set(1.0)
        return Distribution1D(pmf=pmf, cdf=cdf, integral=total)

    def sample(self, u: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Sample entry index; returns (index, pmf[index])."""
        n = self.pmf.shape[0]
        if n <= 64:
            # compare-sum beats per-lane binary search on TPU vector lanes
            idx = jnp.clip(
                jnp.sum(self.cdf[1:-1][None] <= u[..., None], axis=-1), 0, n - 1
            ).astype(jnp.int32)
            from .gather import gather_rows

            return idx, gather_rows(self.pmf, idx)
        idx = jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1
        )
        return idx, self.pmf[idx]

    def sample_reuse(self, u: jax.Array):
        """Sample and rescale u for reuse (reference pmf.h sampleReuse)."""
        idx, p = self.sample(u)
        lo = self.cdf[idx]
        u2 = jnp.where(p > 0, (u - lo) / jnp.maximum(p, 1e-20), 0.0)
        return idx, p, jnp.clip(u2, 0.0, 1.0)


@pytree_dataclass
class Distribution2D:
    """Row-major 2D sampling table (for envmap importance sampling).

    Sample v from the marginal over rows, then u from the conditional within
    the row.  Continuous variant returns (u, v) in [0,1)^2 plus the density
    w.r.t. the unit square.
    """

    cond_cdf: jax.Array  # (H, W+1) conditional CDFs per row
    cond_pmf: jax.Array  # (H, W)
    marg_cdf: jax.Array  # (H+1,)
    marg_pmf: jax.Array  # (H,)

    @staticmethod
    def from_weights(w) -> "Distribution2D":
        w = jnp.asarray(w, Float)
        H, W = w.shape
        row_sum = jnp.sum(w, axis=1)
        safe_rows = jnp.where(row_sum > 0, row_sum, 1.0)[:, None]
        cond_pmf = jnp.where(row_sum[:, None] > 0, w / safe_rows, 1.0 / W)
        cond_cdf = jnp.concatenate(
            [jnp.zeros((H, 1), Float), jnp.cumsum(cond_pmf, axis=1)], axis=1
        )
        cond_cdf = cond_cdf.at[:, -1].set(1.0)
        total = jnp.sum(row_sum)
        safe_total = jnp.where(total > 0, total, 1.0)
        marg_pmf = jnp.where(total > 0, row_sum / safe_total, 1.0 / H)
        marg_cdf = jnp.concatenate([jnp.zeros((1,), Float), jnp.cumsum(marg_pmf)])
        marg_cdf = marg_cdf.at[-1].set(1.0)
        return Distribution2D(
            cond_cdf=cond_cdf, cond_pmf=cond_pmf, marg_cdf=marg_cdf, marg_pmf=marg_pmf
        )

    @property
    def shape(self):
        return self.cond_pmf.shape

    def sample_continuous(self, s: jax.Array):
        """s: (..., 2) -> ((..., 2) uv in [0,1)^2, pdf wrt unit square)."""
        H, W = self.cond_pmf.shape
        u1, u2 = s[..., 0], s[..., 1]
        row = jnp.clip(jnp.searchsorted(self.marg_cdf, u2, side="right") - 1, 0, H - 1)
        mpmf = self.marg_pmf[row]
        dv = jnp.where(mpmf > 0, (u2 - self.marg_cdf[row]) / jnp.maximum(mpmf, 1e-20), 0.5)
        v = (row.astype(Float) + jnp.clip(dv, 0.0, 1.0)) / H

        ccdf = self.cond_cdf[row]  # (..., W+1) gather rows
        col = jnp.clip(
            jax.vmap(lambda c, x: jnp.searchsorted(c, x, side="right"))(
                ccdf.reshape(-1, W + 1), u1.reshape(-1)
            ).reshape(u1.shape)
            - 1,
            0,
            W - 1,
        )
        cpmf = self.cond_pmf[row, col]
        du = jnp.where(cpmf > 0, (u1 - self.cond_cdf[row, col]) / jnp.maximum(cpmf, 1e-20), 0.5)
        u = (col.astype(Float) + jnp.clip(du, 0.0, 1.0)) / W
        pdf = mpmf * H * cpmf * W
        return jnp.stack([u, v], axis=-1), pdf

    def pdf_continuous(self, uv: jax.Array) -> jax.Array:
        H, W = self.cond_pmf.shape
        col = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
        row = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
        return self.marg_pmf[row] * H * self.cond_pmf[row, col] * W
