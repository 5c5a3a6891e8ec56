"""Generate hosek_sky.npz from the published Hosek-Wilkie dataset.

The coefficients are the fitted data released with the SIGGRAPH 2012 paper
"An Analytic Model for Full Spectral Sky-Dome Radiance" (Hosek & Wilkie,
3-clause BSD, http://cgg.mff.cuni.cz/projects/SkylightModelling/).  This
script PARSES the numeric tables out of the authors' published data file
(a copy ships with the reference at
``/root/reference/src/emitters/sunsky/skymodeldata.h``) — none of the
reference's code is used, only the public dataset values.

Layout written:
  data: (11, 2, 10, 6, 9) float32 — wavelength (320..720nm step 40),
        albedo (0/1), turbidity (1..10), bezier knot, coefficient A..I
  rad:  (11, 2, 10, 6) float32 — master radiance control points
"""
from __future__ import annotations

import os
import re

import numpy as np

SRC = "/root/reference/src/emitters/sunsky/skymodeldata.h"
OUT = os.path.join(os.path.dirname(__file__), "hosek_sky.npz")
WAVELENGTHS = list(range(320, 721, 40))  # 11 bands


def parse_array(text: str, name: str) -> np.ndarray:
    m = re.search(re.escape(name) + r"\[\]\s*=\s*\{(.*?)\};", text, re.S)
    if not m:
        raise KeyError(name)
    body = re.sub(r"//[^\n]*", "", m.group(1))
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = [float(x) for x in re.findall(
        r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?", body)]
    return np.asarray(vals, np.float64)


def main():
    text = open(SRC).read()
    data = np.stack([
        parse_array(text, f"dataset{wl}").reshape(2, 10, 6, 9)
        for wl in WAVELENGTHS
    ])
    rad = np.stack([
        parse_array(text, f"datasetRad{wl}").reshape(2, 10, 6)
        for wl in WAVELENGTHS
    ])
    np.savez_compressed(OUT, data=data.astype(np.float32),
                        rad=rad.astype(np.float32),
                        wavelengths=np.asarray(WAVELENGTHS, np.float32))
    print(f"wrote {OUT}: data{data.shape} rad{rad.shape}")


if __name__ == "__main__":
    main()
