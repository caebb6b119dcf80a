"""Scene: two-instance world (ground slab + animated model).

Instance transforms per frame (RayTracer::UpdateFrame, RayTracer.cpp:269-279):

- mesh 0 (ground): scaling(8, 0.5, 8) * translation(0, -0.5, 0)    [static]
- mesh 1 (model):  scaling(s) * rotationY(angle) * translation(pos)
  with angle advancing 16 deg/s * timeStep (RayTracer.cpp:270-272).

``pos_scale`` comes from the CLI ``-mesh <file> [x y z scale]``
(RayTracedGGX.cpp:495-505; default (0, 0, 0, 1)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp
import numpy as np

from ..utils import math3d as m3
from .mesh import Mesh, ground_cube, from_obj
from .material import Materials, default_materials

GROUND = 0
MODEL = 1
NUM_MESH = 2


@dataclass
class Scene:
    meshes: List[Mesh]
    materials: Materials
    pos_scale: np.ndarray = field(
        default_factory=lambda: np.array([0.0, 0.0, 0.0, 1.0], np.float32))
    # additional animated model instances (multi-instance TLAS — BASELINE
    # config 5); each entry is a (x, y, z, scale) like pos_scale
    extra_instances: tuple = ()
    # ground plate XZ half-extent, matching the reference
    # (RayTracer.cpp:192 XMMatrixScaling(8, 0.5, 8)); kept as a field so
    # fidelity A/Bs can sweep it against the published render
    ground_scale: float = 8.0

    @staticmethod
    def create(model_path: str, pos_scale=(0.0, 0.0, 0.0, 1.0),
               materials: Materials | None = None,
               extra_instances: tuple = ()) -> "Scene":
        return Scene(
            meshes=[ground_cube(), from_obj(model_path)],
            materials=materials or default_materials(),
            pos_scale=np.asarray(pos_scale, np.float32),
            extra_instances=tuple(tuple(float(v) for v in e)
                                  for e in extra_instances),
        )

    @property
    def mesh_ids(self):
        """Instance -> mesh index (instance 0 = ground, rest = the model)."""
        return (0, 1) + (1,) * len(self.extra_instances)

    def instance_materials(self) -> Materials:
        """Per-INSTANCE material arrays (instances share their mesh's
        material, matching the reference's per-mesh CBMaterial)."""
        ids = list(self.mesh_ids)
        from .material import Materials as M
        return M(base_colors=self.materials.base_colors[ids].copy(),
                 rough_metals=self.materials.rough_metals[ids].copy())

    def _model_world(self, angle, pos_scale):
        s = float(pos_scale[3])
        return (m3.scaling(s, s, s) @ m3.rotation_y(angle)
                @ m3.translation(*[float(v) for v in pos_scale[:3]]))

    def worlds(self, angle):
        """(I, 4, 4) world matrices for animation angle (traceable)."""
        g = float(self.ground_scale)
        ground = m3.scaling(g, 0.5, g) @ m3.translation(0.0, -0.5, 0.0)
        ws = [ground, self._model_world(angle, self.pos_scale)]
        ws += [self._model_world(angle, ps) for ps in self.extra_instances]
        return jnp.stack(ws)

    def normal_matrices(self, worlds):
        """(NUM_MESH, 3, 3) inverse-transpose normal matrices.

        The reference passes identity for the ground and the bare rotation
        for the model (RayTracer.cpp:294); the proper inverse-transpose
        reduces to the same unit normals after shader-side normalization.
        """
        return jnp.stack([m3.normal_matrix(w) for w in worlds])
