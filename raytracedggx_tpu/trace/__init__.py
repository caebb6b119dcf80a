from .intersect import moller_trumbore, ray_aabb  # noqa: F401
from .traverse import trace_rays, trace_bruteforce, trace_scene, HitRecord  # noqa: F401
