from . import math, warp, rng, spectrum, distribution
from .types import (
    Float,
    Int,
    EPSILON,
    SHADOW_EPSILON,
    INVALID,
    pytree_dataclass,
    static_field,
)
from .transform import Transform
from .properties import Properties
from . import registry
