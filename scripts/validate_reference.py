"""Validate the renderer against the reference's own published image
(/root/reference/Doc/Images/rnl_dragon.png — dragon + rnl probe,
RayTracedGGX.cpp:37-39/261-278).

Unknowns recovered by search:
- animation angle (16 deg/s free-running, RayTracer.cpp:270-272);
- CAMERA: the app supports mouse orbit around the focus point at
  constant distance plus wheel zoom (RayTracedGGX.cpp:401-455), so the
  screenshot's camera is an unknown (yaw, pitch, dist) orbit of
  focus (0, 3, 0) — round 2 searched only the angle and plateaued at
  SSIM 0.68 with a visibly mis-scaled ground plate;
- ground plate scale: the current source says 8 (RayTracer.cpp:192) but
  the published image may predate it, so {8, 10} are both probed.

Stage 1 sweeps the angle at the default camera, stage 2 runs coordinate
descent over (angle, yaw, pitch, dist) per ground scale, stage 3 renders
the winner at 1280x720 with a converged TAA history and records metrics
+ artifacts under docs/validation/.

Run on TPU: python scripts/validate_reference.py
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402

REF_PNG = "/root/reference/Doc/Images/rnl_dragon.png"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "validation")


def load_ref():
    from PIL import Image

    img = np.asarray(Image.open(REF_PNG).convert("RGB"),
                     np.float32) / 255.0
    return img


_RENDERERS = {}

# default orbit parameters of eye (10, 10, -24) about focus (0, 3, 0)
FOCUS = np.array([0.0, 3.0, 0.0], np.float32)
DIST0 = float(np.linalg.norm([10.0, 7.0, -24.0]))          # 26.93
PITCH0 = float(np.arcsin(7.0 / DIST0))                     # 0.263
YAW0 = float(np.arctan2(10.0, -24.0))                      # 2.747


def _renderer(w, h, gs=8.0):
    """One Renderer per (resolution, ground scale): the camera is a
    RUNTIME input (Renderer.step(cam=...)), so every orbit probe reuses
    the same compiled frame program."""
    key = (w, h, gs)
    if key not in _RENDERERS:
        from raytracedggx_tpu.engine import Renderer, RenderConfig
        from raytracedggx_tpu.io.dds import load_cubemap_env
        from raytracedggx_tpu.scene import Scene

        env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
        scene = Scene.create("/root/reference/Bin/Assets/dragon.obj")
        scene.ground_scale = gs
        _RENDERERS[key] = Renderer(scene, env=env,
                                   config=RenderConfig(width=w, height=h))
    return _RENDERERS[key]


def cam_arrays(w, h, yaw, pitch, dist):
    """(view_proj, proj_to_world, eye) for an orbit camera: eye on the
    sphere of radius `dist` about the focus point, up = +Y (the
    reference's view-space drags keep roll ~0 for simple orbits)."""
    import jax.numpy as jnp

    from raytracedggx_tpu.scene.camera import Camera
    from raytracedggx_tpu.utils import math3d as m3

    u = np.array([np.cos(pitch) * np.sin(yaw), np.sin(pitch),
                  np.cos(pitch) * np.cos(yaw)], np.float32)
    eye = FOCUS + dist * u
    cam = Camera(width=w, height=h, eye=eye)
    vp = jnp.asarray(cam.view_proj())
    return (vp, m3.inverse(vp), jnp.asarray(eye, jnp.float32))


def render(angle, w, h, frames=24, cam=None, gs=8.0):
    import jax.numpy as jnp

    r = _renderer(w, h, gs)

    def run():
        state = r.init_state()
        # park the model at the target angle, then accumulate TAA with
        # dt=0 (pause semantics: jitter advances, animation does not —
        # RayTracedGGX.cpp:290-292)
        state = state._replace(angle=jnp.float32(angle))
        frame = None
        for _ in range(frames):
            state, frame, _ = r.step(state, dt=0.0, cam=cam)
        return np.clip(np.asarray(frame), 0.0, 1.0)

    # the tunneled remote-compile endpoint drops bodies occasionally;
    # one retry rides out the transient
    try:
        return run()
    except Exception as e:  # noqa: BLE001
        print(f"render retry after: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        time.sleep(10.0)
        return run()


def main():
    from raytracedggx_tpu.io import write_png
    from raytracedggx_tpu.utils.ssim import ssim, downsample

    ref = load_ref()
    os.makedirs(OUT_DIR, exist_ok=True)

    # stage 1: coarse angle sweep at 320x180.  Skippable:
    #   validate_reference.py <angle>                      (skip 1+1b)
    #   validate_reference.py <angle> <yaw> <pitch> <dist> (seed descent)
    ref_small = downsample(ref, 4)
    t0 = time.time()
    seed = [float(v) for v in sys.argv[1:]]
    best = (-1.0, seed[0] if seed else 0.0)
    if not seed:
        for ang in np.arange(0.0, 2 * np.pi, np.pi / 12):
            img = render(ang, 320, 180, frames=12)
            s = ssim(img, ref_small)
            print(f"angle {ang:5.2f} rad: ssim {s:.4f}", flush=True)
            if s > best[0]:
                best = (s, ang)
        # stage 1b: refine +-7.5 deg around the winner
        for ang in best[1] + np.linspace(-np.pi / 24, np.pi / 24, 7):
            img = render(float(ang), 320, 180, frames=12)
            s = ssim(img, ref_small)
            print(f"refine {ang:5.3f} rad: ssim {s:.4f}", flush=True)
            if s > best[0]:
                best = (s, float(ang))
        print(f"sweep took {time.time() - t0:.0f}s; best angle "
              f"{best[1]:.3f} (ssim {best[0]:.4f})", flush=True)

    # stage 2: coordinate descent over (angle, yaw, pitch, dist) per
    # ground scale — the published screenshot's camera is an unknown
    # mouse orbit (RayTracedGGX.cpp:401-455)
    def evaluate(p, gs):
        cam = cam_arrays(320, 180, p[1], p[2], p[3])
        img = render(p[0], 320, 180, frames=12, cam=cam, gs=gs)
        return ssim(img, ref_small)

    results = {}
    for gs in (8.0, 10.0):
        p = (list(seed) if len(seed) == 4
             else [best[1], YAW0, PITCH0, DIST0])
        steps = [0.06, 0.05, 0.04, 1.5]
        s_best = evaluate(p, gs)
        t1 = time.time()
        for it in range(24):
            improved = False
            for i in range(4):
                for sgn in (1.0, -1.0):
                    q = list(p)
                    q[i] += sgn * steps[i]
                    s = evaluate(q, gs)
                    if s > s_best:
                        s_best, p, improved = s, q, True
                        break
            if not improved:
                steps = [st * 0.5 for st in steps]
                if max(steps) < 0.004:
                    break
            print(f"gs={gs} iter {it}: ssim {s_best:.4f} p="
                  f"[{p[0]:.3f}, {p[1]:.3f}, {p[2]:.3f}, {p[3]:.2f}] "
                  f"({time.time() - t1:.0f}s)", flush=True)
        results[gs] = (s_best, p)
    gs = max(results, key=lambda g: results[g][0])
    s_low, p = results[gs]
    print(f"winner: gs={gs} ssim {s_low:.4f} angle={p[0]:.4f} "
          f"yaw={p[1]:.4f} pitch={p[2]:.4f} dist={p[3]:.3f}", flush=True)

    # stage 3: full-res render at the winning configuration
    cam = cam_arrays(1280, 720, p[1], p[2], p[3])
    img = render(p[0], 1280, 720, frames=32, cam=cam, gs=gs)
    s_full = ssim(img, ref)
    s_half = ssim(downsample(img, 2), downsample(ref, 2))
    write_png(os.path.join(OUT_DIR, "rnl_dragon_tpu.png"), img)
    # CI gate baseline: the 320x180 SSIM at the winning configuration.
    # tests/test_reference_image.py re-renders this exact configuration
    # on CPU and asserts SSIM >= ssim_gate - margin, so kernel rewrites
    # that drift the image fail CI (VERDICT r2 item 5).
    img_lo = render(p[0], 320, 180, frames=12,
                    cam=cam_arrays(320, 180, p[1], p[2], p[3]), gs=gs)
    s_gate = ssim(img_lo, ref_small)

    metrics = dict(angle=p[0], yaw=p[1], pitch=p[2], dist=p[3],
                   ground_scale=gs, ssim_720p=round(s_full, 4),
                   ssim_360p=round(s_half, 4),
                   ssim_gate_320=round(float(s_gate), 4),
                   mean_abs=round(float(np.abs(img - ref).mean()), 5))
    with open(os.path.join(OUT_DIR, "rnl_dragon_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
