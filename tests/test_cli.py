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


def test_interactive_loop_hotkeys(tmp_path):
    """Runtime interaction surface: drive every hotkey analog
    (RayTracedGGX.cpp:365-455) through the --interactive REPL with a
    command script and check the session state changes land."""
    import io

    from raytracedggx_tpu.engine.cli import interactive_loop, parse_args
    from raytracedggx_tpu.scene import Scene, default_materials
    from raytracedggx_tpu.scene.mesh import ground_cube
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    scene = Scene(meshes=[ground_cube(), ground_cube()],
                  materials=default_materials(),
                  pos_scale=np.array([0, 3.0, 0, 1.0], np.float32))
    r = Renderer(scene, config=RenderConfig(width=48, height=32))
    state = r.init_state()
    out = tmp_path / "i.png"
    args = parse_args(["--out", str(out), "--frames-per-cmd", "1"])

    script = io.StringIO("\n".join([
        "pause", "right", "up", "down", "down",   # mesh 1 metallic -0.25
        "a",                                      # async split on
        "drag 64 -32", "wheel 1",                 # orbit + dolly
        "shot", "run 2", "help", "bogus", "quit",
    ]) + "\n")
    state, frame = interactive_loop(r, state, args, scene, "ground",
                                    stream=script)
    assert frame is not None and np.isfinite(np.asarray(frame)).all()
    # 'up' clamps at the default 1.0 (reference: min(m+0.25, 1)), then
    # two 'down's -> mesh 1 at 0.5
    rm = np.asarray(r.materials.rough_metals)
    mesh1_insts = [i for i, m in enumerate(scene.mesh_ids) if m == 1]
    assert np.allclose(rm[mesh1_insts, 1], 0.5)
    assert r.config.async_compute            # 'a' toggled from default off
    assert (tmp_path / "i_shot001.png").exists()


def test_orbit_controller_matches_reference_semantics():
    """OnMouseMove/OnMouseWheel math (RayTracedGGX.cpp:401-455): a drag
    preserves the orbit radius about the focus; a wheel notch moves the
    eye toward the focus by len/16; yaw-only drags stay on the same
    latitude circle."""
    from raytracedggx_tpu.scene.camera import Camera, OrbitController

    cam = Camera(width=1280, height=720)
    orb = OrbitController(cam)
    r0 = np.linalg.norm(orb.focus - orb.eye)

    orb.drag(320.0, -90.0)
    assert np.isclose(np.linalg.norm(orb.focus - orb.eye), r0, rtol=1e-4)

    # full-width drag = 2*pi yaw -> back to the start
    orb2 = OrbitController(Camera(width=1280, height=720))
    eye0 = orb2.eye.copy()
    orb2.drag(1280.0, 0.0)
    assert np.allclose(orb2.eye, eye0, atol=1e-3)

    orb3 = OrbitController(Camera(width=1280, height=720))
    r1 = np.linalg.norm(orb3.focus - orb3.eye)
    orb3.wheel(1.0)
    assert np.isclose(np.linalg.norm(orb3.focus - orb3.eye),
                      r1 * (1 - 1 / 16), rtol=1e-4)

    # arrays() emits a usable cam triple
    vp, p2w, eye = orb3.arrays()
    assert vp.shape == (4, 4) and p2w.shape == (4, 4) and eye.shape == (3,)
    assert np.isfinite(np.asarray(vp)).all()
