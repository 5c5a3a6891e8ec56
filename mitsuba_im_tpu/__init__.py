"""mitsuba_im_tpu — a TPU-native differentiable Monte Carlo renderer.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
reference C++ renderer mitsuba-im (interactive fork of Mitsuba 0.6): scene
XML loading, a wavefront path-tracing core with NEE + MIS, a plugin surface
of BSDFs/emitters/sensors/samplers/films/shapes, responsive progressive
rendering, and (beyond the reference) reverse-mode scene-parameter gradients
via path-replay backpropagation, sharded across TPU meshes with pjit.
"""

__version__ = "0.1.0"

from .core import Transform, Properties  # noqa: F401
