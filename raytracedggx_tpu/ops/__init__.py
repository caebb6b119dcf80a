from .flatten import FlatBVH, flatten_bvh, refit_flat_bvh  # noqa: F401
from .traverse_pallas import (trace_rays_pallas, trace_scene_pallas,  # noqa: F401
                              sort_rays_morton)
