from .lbvh import LBVH, build_lbvh, refit_lbvh  # noqa: F401
from .tlas import TLAS, build_tlas, refit_tlas  # noqa: F401
