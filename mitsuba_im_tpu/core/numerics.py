"""Numerical utilities: Brent root finding, cubic splines, quadrature, vMF.

Parity targets in the reference core
(``/root/reference/include/mitsuba/core/{brent,spline,quad,vmf}.h``):
Brent's method (brent.h), Catmull-Rom / natural cubic spline evaluation and
sampling (spline.h), Gauss-Legendre / Gauss-Lobatto quadrature rules
(quad.h:305) used by the chi-square verifier, and the von Mises-Fisher
distribution (vmf.h) used by the microflake phase function.

These are *host-side or trace-time* helpers (rule tables are numpy; the
evaluators accept jnp arrays and trace cleanly under jit).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Brent's method (brent.h BrentSolver)
# ---------------------------------------------------------------------------

def brent(f, a: float, b: float, xtol: float = 1e-10, rtol: float = 1e-10,
          maxiter: int = 100):
    """Find a root of f in [a, b] (f(a), f(b) must bracket).

    Returns (x, converged).  Pure-python scalar solver (the reference uses
    it host-side for lens sampling / spline inversion; hot-path inversions
    on device use the vectorized bisection below instead)."""
    fa, fb = f(a), f(b)
    if fa * fb > 0:
        return 0.5 * (a + b), False
    if abs(fa) < abs(fb):
        a, b, fa, fb = b, a, fb, fa
    c, fc = a, fa
    d = e = b - a
    for _ in range(maxiter):
        if fb == 0.0:
            return b, True
        if fa != fc and fb != fc:
            # inverse quadratic interpolation
            s = (a * fb * fc / ((fa - fb) * (fa - fc))
                 + b * fa * fc / ((fb - fa) * (fb - fc))
                 + c * fa * fb / ((fc - fa) * (fc - fb)))
        else:
            s = b - fb * (b - a) / (fb - fa)  # secant
        cond = not (min(a, b) < s < max(a, b)) or abs(s - b) >= abs(e) / 2
        if cond:
            s = 0.5 * (a + b)  # bisection fallback
            e = d = b - a
        else:
            e, d = d, abs(s - b)
        fs = f(s)
        c, fc = b, fb
        if fa * fs < 0:
            b, fb = s, fs
        else:
            a, fa = s, fs
        if abs(fa) < abs(fb):
            a, b, fa, fb = b, a, fb, fa
        if abs(b - a) < xtol + rtol * abs(b):
            return b, True
    return b, False


def bisect_vec(f, lo, hi, iters: int = 32):
    """Vectorized bisection on device arrays (monotone f); jit-safe."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        neg = f(mid) < 0
        lo = jnp.where(neg, mid, lo)
        hi = jnp.where(neg, hi, mid)
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# Cubic splines (spline.h)
# ---------------------------------------------------------------------------

def catmull_rom_weights(t):
    """Hermite basis weights for a uniform Catmull-Rom segment, t in [0,1]:
    returns (w_{-1}, w0, w1, w2)."""
    t2, t3 = t * t, t * t * t
    return (
        -0.5 * t3 + t2 - 0.5 * t,
        1.5 * t3 - 2.5 * t2 + 1.0,
        -1.5 * t3 + 2.0 * t2 + 0.5 * t,
        0.5 * t3 - 0.5 * t2,
    )


def eval_spline_1d(nodes_x: np.ndarray, values: np.ndarray, x):
    """Catmull-Rom interpolation of irregularly sampled 1D data (the
    reference's evalCubicInterp1D, spline.h), jit-traceable in x."""
    nx = jnp.asarray(nodes_x, jnp.float32)
    vals = jnp.asarray(values, jnp.float32)
    n = nx.shape[0]
    x = jnp.asarray(x, jnp.float32)
    i = jnp.clip(jnp.searchsorted(nx, x, side="right") - 1, 0, n - 2)
    x0 = nx[i]
    x1 = nx[i + 1]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-12)
    f0 = vals[i]
    f1 = vals[i + 1]
    fm = vals[jnp.maximum(i - 1, 0)]
    f2 = vals[jnp.minimum(i + 2, n - 1)]
    # one-sided tangents at the domain ends (natural-ish)
    d0 = 0.5 * (f1 - fm)
    d1 = 0.5 * (f2 - f0)
    t2, t3 = t * t, t * t * t
    return ((2 * t3 - 3 * t2 + 1) * f0 + (t3 - 2 * t2 + t) * d0
            + (-2 * t3 + 3 * t2) * f1 + (t3 - t2) * d1)


def sample_spline_cdf(nodes_x: np.ndarray, pdf_values: np.ndarray, u):
    """Sample x ~ pdf (piecewise-linear approximation of the spline pdf);
    returns (x, pdf(x)).  Host-precomputed CDF, device inversion."""
    nx = np.asarray(nodes_x, np.float64)
    pv = np.maximum(np.asarray(pdf_values, np.float64), 0.0)
    seg = 0.5 * (pv[1:] + pv[:-1]) * np.diff(nx)
    cdf = np.concatenate([[0.0], np.cumsum(seg)])
    total = max(cdf[-1], 1e-20)
    cdf_n = jnp.asarray(cdf / total, jnp.float32)
    nxj = jnp.asarray(nx, jnp.float32)
    pvj = jnp.asarray(pv / total, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    i = jnp.clip(jnp.searchsorted(cdf_n, u, side="right") - 1, 0,
                 len(nx) - 2)
    du = (u - cdf_n[i]) / jnp.maximum(cdf_n[i + 1] - cdf_n[i], 1e-12)
    x = nxj[i] + du * (nxj[i + 1] - nxj[i])
    pdf = pvj[i] + du * (pvj[i + 1] - pvj[i])
    return x, pdf


# ---------------------------------------------------------------------------
# Quadrature (quad.h): Gauss-Legendre & Gauss-Lobatto nodes/weights
# ---------------------------------------------------------------------------

def gauss_legendre(n: int):
    """Nodes/weights on [-1, 1] (quad.h gaussLegendre)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


def gauss_lobatto(n: int):
    """Gauss-Lobatto nodes/weights on [-1, 1] (endpoints included;
    quad.h gaussLobatto).  Exact for polynomials up to degree 2n-3."""
    assert n >= 2
    # interior nodes are roots of P'_{n-1}
    c = np.zeros(n)
    c[-1] = 1.0
    dP = np.polynomial.legendre.legder(c)
    xi = np.polynomial.legendre.legroots(dP)
    x = np.concatenate([[-1.0], np.sort(xi), [1.0]])
    Pn1 = np.polynomial.legendre.legval(x, c)
    w = 2.0 / (n * (n - 1) * Pn1 ** 2)
    return x, w


def integrate_adaptive(f, a: float, b: float, tol: float = 1e-8,
                       max_depth: int = 12):
    """Adaptive Gauss-Lobatto integration (the chi-square verifier's
    quadrature backbone, chisquare.h:81 + quad.h GaussLobattoIntegrator)."""
    x7, w7 = gauss_lobatto(7)
    x3, w3 = gauss_lobatto(3)

    def rec(a, b, depth):
        h = 0.5 * (b - a)
        c = 0.5 * (a + b)
        f7 = sum(wi * f(c + h * xi) for xi, wi in zip(x7, w7)) * h
        f3 = sum(wi * f(c + h * xi) for xi, wi in zip(x3, w3)) * h
        if depth >= max_depth or abs(f7 - f3) < tol * max(abs(f7), 1.0):
            return f7
        return rec(a, c, depth + 1) + rec(c, b, depth + 1)

    return rec(float(a), float(b), 0)


# ---------------------------------------------------------------------------
# von Mises-Fisher (vmf.h) — used by the microflake phase function
# ---------------------------------------------------------------------------

def vmf_pdf(cos_theta, kappa):
    """vMF density on the sphere about the +z axis."""
    cos_theta = jnp.asarray(cos_theta, jnp.float32)
    kappa = jnp.asarray(kappa, jnp.float32)
    iso = 1.0 / (4.0 * jnp.pi)
    norm = kappa / (4.0 * jnp.pi * jnp.sinh(kappa))
    # numerically stable form: k e^{k(c-1)} / (2pi (1 - e^{-2k}))
    stable = (kappa * jnp.exp(kappa * (cos_theta - 1.0))
              / (2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa))))
    del norm
    return jnp.where(kappa < 1e-4, iso, stable)


def vmf_sample(u1, u2, kappa):
    """Sample a direction (local frame, mean = +z) from vMF(kappa)."""
    u1 = jnp.asarray(u1, jnp.float32)
    kappa = jnp.asarray(kappa, jnp.float32)
    # inverse CDF of cos(theta): c = 1 + log(u + (1-u) e^{-2k}) / k
    ct_vmf = 1.0 + jnp.log(jnp.maximum(
        u1 + (1.0 - u1) * jnp.exp(-2.0 * kappa), 1e-38)) / jnp.maximum(kappa, 1e-12)
    ct = jnp.where(kappa < 1e-4, 1.0 - 2.0 * u1, ct_vmf)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def vmf_kappa_for_fiber(stddev: float) -> float:
    """Reference vmf.h forMeanCosine-style helper: concentration from an
    angular standard deviation (radians)."""
    return 1.0 / max(stddev * stddev, 1e-8)
