"""Utility launcher — the ``mtsutil`` surface
(``/root/reference/src/mitsuba/mtsutil.cpp:450`` + ``src/utils/`` plugins).

Subcommands: tonemap, addimages, joinrgb, kdbench (ray-throughput
benchmark, the ``utils/kdbench.cpp:257`` analog), and ``-t`` (run the test
suite, the reference's testcase runner analog).

Usage: python -m mitsuba_im_tpu.cli.mtsutil <subcommand> [args]
"""
from __future__ import annotations

import argparse
import sys
import time


def cmd_tonemap(argv):
    """EXR -> LDR conversion (utils/tonemap.cpp analog)."""
    ap = argparse.ArgumentParser(prog="mtsutil tonemap")
    ap.add_argument("input")
    ap.add_argument("-o", dest="output", default=None)
    ap.add_argument("-g", dest="gamma", type=float, default=-1.0,
                    help="gamma (-1 = sRGB)")
    ap.add_argument("-m", dest="multiplier", type=float, default=1.0)
    ap.add_argument("-r", dest="reinhard", action="store_true",
                    help="Reinhard tonemapping")
    ap.add_argument("-k", dest="key", type=float, default=0.18)
    a = ap.parse_args(argv)
    import os
    import numpy as np
    from ..io import bitmap as bmp

    img = bmp.load(a.input) * a.multiplier
    if a.reinhard:
        lum = (img[..., 0] * 0.212671 + img[..., 1] * 0.715160
               + img[..., 2] * 0.072169)
        avg = np.exp(np.mean(np.log(np.maximum(lum, 1e-6))))
        scaled = img * (a.key / max(avg, 1e-9))
        img = scaled / (1.0 + scaled)
    if a.gamma <= 0:
        c = np.clip(img, 0, 1)
        img = np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)
    else:
        img = np.clip(img, 0, 1) ** (1.0 / a.gamma)
    out = a.output or os.path.splitext(a.input)[0] + ".png"
    bmp.save(out, np.clip(img, 0, 1))
    print(f"[tonemap] {out}")
    return 0


def cmd_addimages(argv):
    """Weighted sum of images (utils/addimages.cpp analog)."""
    ap = argparse.ArgumentParser(prog="mtsutil addimages")
    ap.add_argument("weight_a", type=float)
    ap.add_argument("image_a")
    ap.add_argument("weight_b", type=float)
    ap.add_argument("image_b")
    ap.add_argument("output")
    a = ap.parse_args(argv)
    from ..io import bitmap as bmp

    img = a.weight_a * bmp.load(a.image_a) + a.weight_b * bmp.load(a.image_b)
    bmp.save(a.output, img)
    print(f"[addimages] {a.output}")
    return 0


def cmd_joinrgb(argv):
    """Merge three monochrome images into RGB (utils/joinrgb.cpp analog)."""
    ap = argparse.ArgumentParser(prog="mtsutil joinrgb")
    ap.add_argument("red")
    ap.add_argument("green")
    ap.add_argument("blue")
    ap.add_argument("output")
    a = ap.parse_args(argv)
    import numpy as np
    from ..io import bitmap as bmp

    r = bmp.load(a.red)[..., 0]
    g = bmp.load(a.green)[..., 0]
    b = bmp.load(a.blue)[..., 0]
    bmp.save(a.output, np.stack([r, g, b], axis=-1))
    print(f"[joinrgb] {a.output}")
    return 0


def cmd_kdbench(argv):
    """Ray-intersection throughput benchmark (utils/kdbench.cpp analog):
    loads a scene, fires incoherent rays, reports MRays/s (best of 3)."""
    ap = argparse.ArgumentParser(prog="mtsutil kdbench")
    ap.add_argument("scene")
    ap.add_argument("-n", dest="n_rays", type=int, default=1 << 20)
    ap.add_argument("-D", dest="defines", action="append", default=[])
    a = ap.parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..scene.xml import load_scene

    params = dict(d.split("=", 1) for d in a.defines)
    scene, _ = load_scene(a.scene, params)
    print(f"[kdbench] {scene.geom.n_tris} triangles, "
          f"{'BVH' if scene.use_bvh else 'brute-force'} intersector")

    c = np.asarray(scene.emitters.bsphere_center)
    r = float(scene.emitters.bsphere_radius)
    key = jax.random.key(7)
    o = jnp.asarray(c) + jax.random.uniform(key, (a.n_rays, 3), minval=-r, maxval=r)
    d = jax.random.normal(jax.random.key(8), (a.n_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    f = jax.jit(lambda o, d: scene.ray_intersect(o, d).t)
    f(o, d).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            out = f(o, d)
        jax.block_until_ready(out)
        best = max(best, 8 * a.n_rays / (time.perf_counter() - t0))
    print(f"[kdbench] {best / 1e6:.1f} MRays/s (best of 3, incoherent)")
    return 0


def cmd_rdielprec(argv):
    """Regenerate the rough dielectric transmittance tables
    (utils/rdielprec.cpp analog; tables consumed by roughplastic /
    roughcoating, bsdf/rtrans.py)."""
    ap = argparse.ArgumentParser(prog="mtsutil rdielprec")
    ap.add_argument("-o", dest="output", default=None)
    ap.add_argument("-n", dest="samples", type=int, default=2048)
    a = ap.parse_args(argv)
    from ..bsdf import rtrans

    path = rtrans.save_tables(a.output, m_samples=a.samples, verbose=True)
    print(f"[rdielprec] wrote {path}")
    return 0


def cmd_chisquare(argv):
    """Chi-square GOF check of a BSDF's sampler vs its pdf (the headless
    analog of the reference's cylclip/chi-square debug viewers)."""
    ap = argparse.ArgumentParser(prog="mtsutil chisquare")
    ap.add_argument("bsdf", help="bsdf plugin name, e.g. roughplastic")
    ap.add_argument("-D", dest="defines", action="append", default=[],
                    help="plugin parameter key=value")
    a = ap.parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from ..bsdf import common as bc
    from ..bsdf.eval import bsdf_pdf, bsdf_sample
    from ..core import rng as mrng
    from ..core.chisquare import chi2_test
    from ..core.properties import Properties
    from ..core.registry import create
    from ..texture.texture import TextureBuilder

    props = Properties(a.bsdf)
    for d in a.defines:
        k, val = d.split("=", 1)
        try:
            props[k] = float(val)
        except ValueError:
            props[k] = val
    rec = create("bsdf", props, None)
    table = bc.build_table([rec])
    tex = TextureBuilder().build()
    wi = np.asarray([0.6, 0.2, 0.775], np.float64)
    wi /= np.linalg.norm(wi)

    def params(nn):
        return bc.resolve(table, tex, jnp.zeros(nn, jnp.int32),
                          jnp.zeros((nn, 2), jnp.float32))

    def sample_fn(nn):
        p = params(nn)
        s = mrng.make_sampler(jnp.arange(nn), 0, 7)
        s, u1 = mrng.next_1d(s)
        s, u2 = mrng.next_2d(s)
        wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (nn, 3))
        out = bsdf_sample(p, wi_b, u1, u2)
        keep = (np.asarray(~out.delta) & (np.asarray(out.pdf) > 1e-9)
                & (np.linalg.norm(np.asarray(out.weight), axis=-1) > 0))
        return np.asarray(out.wo)[keep]

    def pdf_fn(dirs):
        nn = len(dirs)
        p = params(nn)
        wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (nn, 3))
        return np.asarray(bsdf_pdf(p, wi_b, jnp.asarray(dirs, jnp.float32)))

    ok, pval, info = chi2_test(sample_fn, pdf_fn, n_samples=1 << 17)
    print(f"[chisquare] {a.bsdf}: {'PASS' if ok else 'FAIL'} "
          f"(p={pval:.4f}; {info})")
    return 0 if ok else 1


def cmd_tests(argv):
    import subprocess

    return subprocess.call([sys.executable, "-m", "pytest", "tests/", "-q"] + argv)


def cmd_docs(argv):
    """Print the plugin reference: every registered plugin per category,
    with auto-extracted parameters/defaults where dry instantiation is
    safe (the configurator's recordQueriesAndDefaults introspection)."""
    from ..core.registry import available_plugins
    from ..interactive.configurator import extract_parameters, _INTROSPECTABLE

    cats = ["integrator", "bsdf", "shape", "emitter", "sensor", "sampler",
            "film", "rfilter", "texture", "medium", "phase", "volume",
            "subsurface", "utility"]
    for cat in cats:
        names = available_plugins(cat)
        if not names:
            continue
        print(f"\n## {cat} ({len(names)})")
        for name in names:
            if cat in _INTROSPECTABLE:
                params = extract_parameters(cat, name)
                ps = ", ".join(
                    f"{k}={v['default']!r}" for k, v in sorted(params.items())
                ) or "-"
                print(f"  {name:<18} {ps}")
            else:
                print(f"  {name}")
    return 0


COMMANDS = {
    "tonemap": cmd_tonemap,
    "addimages": cmd_addimages,
    "joinrgb": cmd_joinrgb,
    "kdbench": cmd_kdbench,
    "rdielprec": cmd_rdielprec,
    "chisquare": cmd_chisquare,
    "docs": cmd_docs,
}

# expose the utilities through the plugin registry so the introspection
# surface (configurator / getAvailablePlugins analog) lists them, as the
# reference's MTS_EXPORT_UTILITY marker scan does
from ..core.registry import register as _register  # noqa: E402

for _name, _fn in COMMANDS.items():
    _register("utility", _name)(lambda props, ctx=None, _f=_fn: _f)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "-t":
        return cmd_tests(argv[1:])
    if not argv or argv[0] not in COMMANDS:
        print(__doc__)
        print("Available utilities:", ", ".join(sorted(COMMANDS)), "| -t (tests)")
        return 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
