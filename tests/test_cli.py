import pytest
import numpy as np

from raytracedggx_tpu.engine.cli import parse_args


def test_mesh_flag_with_pos_scale():
    a = parse_args(["-mesh", "m.obj", "0.0", "2.8", "0.0", "0.03"])
    assert a.mesh == ["m.obj", "0.0", "2.8", "0.0", "0.03"]


def test_reference_bat_equivalents():
    # Bin/Bunny.bat / TuringBowl.bat flag shapes parse
    for argv in (["-mesh", "Assets/bunny.obj", "0.0", "0.0", "0.0", "1.0"],
                 ["-env", "Assets/galileo_cross.dds"]):
        a = parse_args(argv)
    assert a.env == "Assets/galileo_cross.dds"


def test_toggles_and_headless_controls():
    a = parse_args(["--no-spatial", "--no-temporal", "--pause",
                    "--bary", "ndc", "--kernels", "pallas",
                    "--metallic", "1", "0.5", "--screenshot", "8",
                    "--extra-instance", "1", "2", "3", "0.5", "-warp"])
    assert a.no_spatial and a.no_temporal and a.pause and a.warp
    assert a.bary == "ndc" and a.kernels == "pallas"
    assert a.metallic == [["1", "0.5"]]
    assert a.extra_instance == [["1", "2", "3", "0.5"]]


@pytest.mark.slow
def test_emulate_formats_end_to_end():
    """Flag-rot guard: the reference-precision storage round-trip config
    renders finite frames."""
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    r = Renderer(scene, config=RenderConfig(width=48, height=32,
                                            emulate_formats=True))
    state = r.init_state()
    state, frame, _ = r.step(state)
    f = np.asarray(frame)
    assert np.isfinite(f).all() and f.max() > 0


@pytest.mark.slow
def test_async_toggle_identical_frames():
    """'A' toggle pair self-check: split-dispatch vs fused program must
    render the same image (RayTracedGGX.cpp:391-396 analog)."""
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    def run(async_compute):
        scene = Scene(meshes=[ground_cube(), ground_cube()],
                      materials=default_materials(),
                      pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
        r = Renderer(scene, config=RenderConfig(
            width=48, height=32, async_compute=async_compute))
        state = r.init_state()
        for _ in range(2):
            state, frame, _ = r.step(state, 1 / 30)
        return np.asarray(frame)

    np.testing.assert_array_equal(run(True), run(False))


def test_run_frames_pipelined():
    """Triple-buffered host loop (FrameCount=3 analog) runs and matches a
    step-by-step loop."""
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    r = Renderer(scene, config=RenderConfig(width=48, height=32))
    _, fast = r.run_frames(4, dt=1 / 30)
    state = r.init_state()
    for _ in range(4):
        state, slow, _ = r.step(state, 1 / 30)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_taa_converges_under_jitter():
    """Static scene + per-frame Halton jitter must converge, not crawl:
    later frames change less than early ones."""
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    r = Renderer(scene, config=RenderConfig(width=64, height=36))
    state = r.init_state()
    prev = None
    deltas = []
    for _ in range(10):
        state, frame, _ = r.step(state, 0.0)   # paused: jitter only
        f = np.asarray(frame)
        if prev is not None:
            deltas.append(np.abs(f - prev).mean())
        prev = f
    assert np.isfinite(f).all()
    # late-frame flicker well below early-frame flicker
    assert np.mean(deltas[-3:]) < np.mean(deltas[:3])
