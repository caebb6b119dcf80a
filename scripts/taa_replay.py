"""TAA-smear hypothesis test (round-4, VERDICT r3 item 5).

The round-3 residual attribution (docs/validation/README.md) claims the
remaining SSIM gap vs the reference's published screenshot
(/root/reference/Doc/Images/rnl_dragon.png) is TAA motion history: the
screenshot was framed with a mouse orbit (its camera is off-default)
while the model spun at 16 deg/s (RayTracer.cpp:270-272), so its
accumulation buffer holds ~15 frames of orbit + rotation smear that a
parked dt=0 re-render cannot reproduce.

This script TESTS that claim: replay N frames of live animation
(dt=1/60) ending at the recovered angle, optionally with the camera
lerping along the recovered orbit (default pose -> winner pose) over
the last K frames, into the history buffer before scoring the final
frame.  If the hypothesis is right, SSIM_720p should rise from the
static 0.6907 toward ~0.8; if it doesn't move, the provenance claim is
dead and the residual needs a real hunt.

Run on TPU: python scripts/taa_replay.py
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402

from validate_reference import (_renderer, cam_arrays, load_ref,  # noqa: E402
                                YAW0, PITCH0, DIST0)

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "validation")
W, H = 1280, 720

# recovered configuration (docs/validation/rnl_dragon_metrics.json)
MET = json.load(open(os.path.join(OUT_DIR, "rnl_dragon_metrics.json")))
ANGLE, YAW, PITCH, DIST = (MET["angle"], MET["yaw"], MET["pitch"],
                           MET["dist"])
GS = MET["ground_scale"]
ANIM_SPEED = 16.0 * np.pi / 180.0


def replay(frames=24, dt=0.0, drag_k=0, render_w=W, render_h=H):
    """Render `frames` frames ending at the recovered (angle, camera).

    dt: per-frame animation step (1/60 = live 16 deg/s rotation; 0 =
    parked).  drag_k: lerp the camera from the DEFAULT orbit pose to the
    recovered pose over the last `drag_k` frames (0 = parked at the
    winner the whole time)."""
    import jax.numpy as jnp

    r = _renderer(render_w, render_h, GS)
    state = r.init_state()
    start = ANGLE - ANIM_SPEED * dt * (frames - 1)
    state = state._replace(angle=jnp.float32(start))
    frame = None
    for i in range(frames):
        if drag_k and i >= frames - drag_k:
            f = (i - (frames - drag_k) + 1) / drag_k
        else:
            f = 0.0 if drag_k else 1.0
        yaw = YAW0 + (YAW - YAW0) * f
        pitch = PITCH0 + (PITCH - PITCH0) * f
        dist = DIST0 + (DIST - DIST0) * f
        cam = cam_arrays(render_w, render_h, yaw, pitch, dist)
        state, frame, _ = r.step(state, dt=dt, cam=cam)
    return np.clip(np.asarray(frame), 0.0, 1.0)


def main():
    from raytracedggx_tpu.io import write_png
    from raytracedggx_tpu.utils.ssim import ssim

    ref = load_ref()
    results = {}

    variants = [
        # (name, frames, dt, drag_k)
        ("static_parked", 24, 0.0, 0),          # round-3 baseline method
        ("anim_live", 24, 1 / 60, 0),           # rotation smear only
        ("anim_drag15", 24, 1 / 60, 15),        # rotation + camera drag
        ("anim_drag8", 24, 1 / 60, 8),
        ("drag15_parked", 24, 0.0, 15),         # camera drag only
        ("anim_live_fast", 24, 1 / 30, 0),      # slower app fps = more
                                                 # smear per frame
    ]
    best = (-1.0, None, None)
    for name, frames, dt, k in variants:
        t0 = time.time()
        img = replay(frames=frames, dt=dt, drag_k=k)
        s = float(ssim(img, ref))
        results[name] = round(s, 4)
        print(f"{name:16s} ssim_720p {s:.4f}  ({time.time() - t0:.0f}s)",
              flush=True)
        if s > best[0]:
            best = (s, name, img)

    print(json.dumps(results), flush=True)
    out = os.path.join(OUT_DIR, "taa_replay_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    if best[1] != "static_parked":
        write_png(os.path.join(OUT_DIR, "rnl_dragon_tpu_replay.png"),
                  best[2])
    print(f"wrote {out}; best = {best[1]} ({best[0]:.4f})", flush=True)


if __name__ == "__main__":
    main()
