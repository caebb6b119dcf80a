from . import math3d, halton, formats  # noqa: F401
