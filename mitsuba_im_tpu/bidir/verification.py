"""Path-space verification harness.

Analog of ``/root/reference/src/libbidir/verification.cpp:24-60``: the
reference re-evaluates every cached vertex/edge quantity of a path from
scratch and enforces <=1e-4 relative agreement (enabled in MTS_BD_DEBUG
builds).  Here the same invariant is checked over the SoA subpaths built by
:func:`mitsuba_im_tpu.integrators.bdpt.random_walk`: cached forward area
densities and throughputs must match values recomputed from the stored
vertex geometry alone.  Exercised by ``tests/test_verification.py`` over
both radiance (eye) and importance (light) transport.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Float
from ..core import math as m
from ..bsdf.eval import bsdf_eval, bsdf_pdf


def _dir(a, b):
    d = b - a
    n = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-20))
    return d / n[..., None], n


def verify_walk(verts, start_p, adjoint=False, rtol=1e-3, scene=None):
    """Re-derive cached subpath quantities and report max relative errors.

    verts: vertex dicts from ``random_walk`` (each with p/ns/ng/wi_local/
    bp/beta/pdf_fwd/delta/valid).  Returns dict(pdf_err, beta_err, checked)
    — max relative mismatch of the cached forward area density and of the
    step throughput ratio, over valid non-delta transitions.

    The throughput invariant: beta[i+1] = beta[i] * eval/pdf * w_arrival
    (with the shading-normal asymmetry correction under importance
    transport), which re-derives the sampler's weight from eval and pdf
    alone — the same eval/pdf/sampleWeight consistency triangle
    verification.cpp checks.  With ``scene`` given and participating
    media present, the harness covers **medium vertices** too: densities
    re-derive through the volume-measure conversion (distance pdf, no
    cosine) and throughputs through sigma_s x phase with the free-flight
    arrival weight (``vertex.h:48`` EMediumInteraction analog).
    """
    from ..integrators.bdpt import (_to_area, _adjoint_correction, _local,
                                    _conv_density, _vertex_f, _vertex_pdf,
                                    _seg_sigma)

    has_media = scene is not None and scene.media.any

    pdf_errs, beta_errs, checked = [], [], 0
    for i in range(1, len(verts)):
        v0, v1 = verts[i - 1], verts[i]
        d01, dist01 = _dir(v0["p"], v1["p"])
        if has_media:
            pdf_sa = _vertex_pdf(scene, v0, d01, True)
            pdf_area = _conv_density(scene, pdf_sa, v0["p"], v1["p"],
                                     v1["ns"], v1["is_med"], v1["mid"],
                                     True)
        else:
            wo_local = _local(v0, d01)
            pdf_sa = bsdf_pdf(v0["bp"], v0["wi_local"], wo_local)
            pdf_area = _to_area(pdf_sa, v0["p"], v1["p"], v1["ns"])
        ok = (np.asarray(v1["valid"]) & ~np.asarray(v0["delta"])
              & (np.asarray(pdf_sa) > 1e-6))
        cached = np.asarray(v1["pdf_fwd"])
        fresh = np.asarray(pdf_area)
        if ok.any():
            rel = np.abs(cached[ok] - fresh[ok]) / np.maximum(
                np.abs(fresh[ok]), 1e-6)
            pdf_errs.append(rel.max())

            if has_media:
                f = _vertex_f(scene, v0, d01, True, adjoint=adjoint)
                step = np.asarray(f) / np.maximum(
                    np.asarray(pdf_sa)[..., None], 1e-20)
                # free-flight arrival weight of the segment into v1
                from ..media import medium as med

                ss_m, st_m, _pt, _g = med.medium_params(
                    scene.media, v1["mid"])
                sbar = np.asarray(_seg_sigma(scene, v1["mid"]))
                dd = np.asarray(dist01)
                tr = np.asarray(med.transmittance(st_m, dist01))
                is_m = np.asarray(v1["is_med"])
                pdf_t = np.maximum(sbar, 1e-20) * np.exp(-sbar * dd)
                p_srf = np.maximum(np.exp(-sbar * dd), 1e-20)
                w_arr = np.where(
                    is_m[..., None],
                    tr * np.asarray(ss_m) / pdf_t[..., None],
                    tr / p_srf[..., None])
                step = step * w_arr
            else:
                f = bsdf_eval(v0["bp"], v0["wi_local"], wo_local)
                step = np.asarray(f) / np.maximum(
                    np.asarray(pdf_sa)[..., None], 1e-20)
                if adjoint:
                    wi_w = np.asarray(
                        v0["ss"] * v0["wi_local"][..., 0:1]
                        + v0["ts"] * v0["wi_local"][..., 1:2]
                        + v0["ns"] * v0["wi_local"][..., 2:3])
                    corr = np.asarray(_adjoint_correction(
                        v0["ns"], v0["ng"], jnp.asarray(wi_w), d01))
                    step = step * corr[..., None]
            b0 = np.asarray(v0["beta"])
            b1 = np.asarray(v1["beta"])
            expect = b0 * step
            mag = np.maximum(np.abs(b1[ok]), 1e-4)
            beta_errs.append(
                (np.abs(b1[ok] - expect[ok]) / mag).max())
            checked += int(ok.sum())
    return dict(
        pdf_err=max(pdf_errs) if pdf_errs else 0.0,
        beta_err=max(beta_errs) if beta_errs else 0.0,
        checked=checked,
    )


def verify_replay(scene, sampler_fn, n=256):
    """ReplayableSampler invariant (``rsampler.h:98``): replaying the same
    stateless sample stream must reproduce path contributions bitwise."""
    a = np.asarray(sampler_fn())
    b = np.asarray(sampler_fn())
    return bool((a == b).all())
