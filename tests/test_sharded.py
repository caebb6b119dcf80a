import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracedggx_tpu.scene import Scene, default_materials
from raytracedggx_tpu.scene.mesh import ground_cube
from raytracedggx_tpu.engine import Renderer, RenderConfig
from raytracedggx_tpu.parallel import ShardedRenderer, make_row_mesh

W, H = 64, 64   # 8 devices -> 8-row bands


def tiny_scene():
    return Scene(meshes=[ground_cube(), ground_cube()],
                 materials=default_materials(),
                 pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual devices")
def test_sharded_matches_single_chip():
    scene = tiny_scene()
    cfg = RenderConfig(width=W, height=H)
    single = Renderer(scene, config=cfg)
    mesh = make_row_mesh()
    sharded = ShardedRenderer(tiny_scene(), mesh=mesh, halo=8, config=cfg)

    s1 = single.init_state()
    s2 = sharded.init_state()
    for _ in range(3):
        s1, f1, _ = single.step(s1, 1 / 60)
        s2, f2, _ = sharded.step(s2, 1 / 60)
    a = np.asarray(f1)
    b = np.asarray(f2)
    assert a.shape == b.shape == (H, W, 3)
    # identical except where the TAA history reprojection exceeded the halo
    # (none expected at this velocity)
    diff = np.abs(a - b)
    assert diff.max() < 1e-4, f"max diff {diff.max()}"
    # state counters replicated correctly
    assert int(np.asarray(s2.frame)) == 3


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual devices")
def test_sharded_history_is_sharded():
    scene = tiny_scene()
    cfg = RenderConfig(width=W, height=H)
    r = ShardedRenderer(scene, mesh=make_row_mesh(), halo=4, config=cfg)
    s = r.init_state()
    s, f, _ = r.step(s)
    assert s.history.shape == (H, W, 4)
    # verify the history array is actually distributed over the mesh
    shard_rows = {sh.index[0].start or 0 for sh in s.history.addressable_shards}
    assert len(shard_rows) == len(jax.devices())
