"""Differential whole-frame profiling: the ONLY reliable timing on the
tunneled TPU is a chained frame loop (block_until_ready is unreliable and
single-dispatch sync pays a ~30 ms RTT — docs/PERF.md).  Each variant
renders N state-chained frames; stage costs come from differences against
the full config.  Usage: python scripts/profile_frame.py [WxH] [frames]"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402


def run_variant(name, scene, env, frames, **cfg_kw):
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    r = Renderer(scene, env=env, config=RenderConfig(**cfg_kw))
    state = r.init_state()
    state, frame, _ = r.step(state, dt=1 / 60)     # compile + warm
    np.asarray(frame)
    t0 = time.time()
    for _ in range(frames):
        state, frame, _ = r.step(state, dt=1 / 60)
    np.asarray(frame)                               # force the whole chain
    dt = (time.time() - t0) / frames * 1e3
    print(f"{name:44s} {dt:8.1f} ms/frame", flush=True)
    return dt


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    w, h = (int(v) for v in res.split("x"))
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.io.dds import load_cubemap_env

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")

    base = dict(width=w, height=h)
    full = run_variant("FULL frame", scene, env, frames, **base)
    variants = [
        ("no refl trace", dict(dbg_no_refl_trace=True)),
        ("no secondary shade", dict(dbg_no_secondary_shade=True)),
        ("no refl trace+shade", dict(dbg_no_refl_trace=True,
                                     dbg_no_secondary_shade=True)),
        ("shade env=no_env", dict(dbg_env_mode="no_env")),
        ("shade env=bilinear", dict(dbg_env_mode="bilinear")),
        ("no spatial", dict(spatial=False)),
        ("no temporal", dict(temporal=False)),
        ("no secondary sort", dict(sort_secondary=False)),
        ("spatial pallas", dict(kernels="pallas")),
        ("no async split", dict(async_compute=False)),
    ]
    for name, kw in variants:
        for attempt in range(3):   # the tunnel's remote-compile endpoint
            try:                   # drops sporadically; retry per variant
                dt = run_variant(name, scene, env, frames, **base, **kw)
                print(f"    -> stage cost ~ {full - dt:+7.1f} ms",
                      flush=True)
                break
            except Exception as e:  # noqa: BLE001
                print(f"{name}: attempt {attempt + 1} failed: "
                      f"{type(e).__name__}", flush=True)
                time.sleep(20)


if __name__ == "__main__":
    main()
