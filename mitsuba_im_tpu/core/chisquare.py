"""Chi-square goodness-of-fit test for directional sampling routines.

Method parity with the reference ``ChiSquare`` harness
(``/root/reference/include/mitsuba/core/chisquare.h:81``): bin the sphere in
(cos_theta, phi), histogram sampled directions, numerically integrate the
claimed pdf per bin (midpoint refinement standing in for the reference's
adaptive Gauss-Lobatto quadrature), pool low-count bins, and compare with a
chi-square test (normal approximation of the statistic's distribution).
"""
from __future__ import annotations

import math

import numpy as np


def chi2_test(
    sample_fn,
    pdf_fn,
    n_samples: int = 1 << 17,
    res_theta: int = 16,
    res_phi: int = 32,
    sub: int = 4,
    significance: float = 0.001,
):
    """Run the GOF test.

    sample_fn(n) -> (n, 3) unit directions (numpy), already excluding
        delta-component samples (callers filter those).
    pdf_fn(dirs) -> (n,) claimed solid-angle pdf at the given directions.

    Returns (passed: bool, p_value: float, info: str).
    """
    d = np.asarray(sample_fn(n_samples))
    assert d.shape[1] == 3
    n_kept = len(d)

    ct = np.clip(d[:, 2], -1.0, 1.0)
    phi = np.arctan2(d[:, 1], d[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    ti = np.minimum((0.5 * (ct + 1.0) * res_theta).astype(int), res_theta - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * res_phi).astype(int), res_phi - 1)
    obs = np.bincount(ti * res_phi + pi_, minlength=res_theta * res_phi).astype(
        np.float64
    )

    # integrate pdf per bin on a midpoint subgrid (uniform in cos_theta, phi)
    rt, rp = res_theta * sub, res_phi * sub
    ct_g = (np.arange(rt) + 0.5) / rt * 2.0 - 1.0
    phi_g = (np.arange(rp) + 0.5) / rp * 2.0 * np.pi
    CT, PH = np.meshgrid(ct_g, phi_g, indexing="ij")
    ST = np.sqrt(np.maximum(0.0, 1.0 - CT**2))
    dirs = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], axis=-1).reshape(-1, 3)
    pdf = np.asarray(pdf_fn(dirs)).reshape(rt, rp)
    cell_sa = (2.0 / rt) * (2.0 * np.pi / rp)  # d(cos_theta) dphi
    exp_fine = pdf * cell_sa
    expected = exp_fine.reshape(res_theta, sub, res_phi, sub).sum((1, 3))
    expected = (expected * n_samples).reshape(-1)

    # pool bins with low expected counts (standard chi-square practice)
    keep = expected > 5.0
    chi2 = float(
        np.sum((obs[keep] - expected[keep]) ** 2 / expected[keep])
    )
    pooled_exp = float(expected[~keep].sum())
    pooled_obs = float(obs[~keep].sum())
    dof = int(keep.sum()) - 1
    if pooled_exp > 5.0:
        chi2 += (pooled_obs - pooled_exp) ** 2 / pooled_exp
        dof += 1
    if dof <= 0:
        return False, 0.0, "degenerate binning"

    p = _chi2_sf(chi2, dof)
    total_exp = expected.sum() + 0.0
    info = (
        f"chi2={chi2:.1f} dof={dof} p={p:.4f} "
        f"mass expected={total_exp / n_samples:.4f} observed={n_kept / n_samples:.4f}"
    )
    return p >= significance, p, info


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of the chi-square distribution via the regularized
    upper incomplete gamma function Q(k/2, x/2)."""
    return _gammainc_q(0.5 * k, 0.5 * x)


def _gammainc_q(a: float, x: float) -> float:
    if x < 0 or a <= 0:
        return 1.0
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # series for P, Q = 1 - P
        ap = a
        s = 1.0 / a
        delta = s
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            s += delta
            if abs(delta) < abs(s) * 1e-12:
                break
        P = s * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, 1.0 - P)
    # continued fraction for Q (Lentz)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-12:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))
