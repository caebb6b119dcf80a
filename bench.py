"""Benchmark: end-to-end frame rate of the flagship pipeline on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.md): bunny scene, 1 spp (primary + GGX reflection +
diffuse), full spatial+temporal denoise + tone map, animated model (TLAS
refit per frame).  Baseline north star: >=60 FPS at 1080p 1spp =
1920*1080*3*60 = 373.2 Mrays/s on one chip; vs_baseline is measured
Mrays/s over that target.  The Mrays count only *live* rays: primary
(W*H) + reflection (one per primary hit) + diffuse (one per primary hit
with metallic < 1) — sky pixels and metal-masked diffuse lanes don't
trace (RayTracing.hlsl:556-563 launches conditionally the same way).

Robustness (round-1 postmortem: a dead TPU tunnel turned the bench into
rc=1 with no JSON): the measurement runs in a CHILD process; the parent
never imports jax and always prints exactly one JSON line — the child's
on success, a value=0 sentinel with a note on crash or timeout.

Env knobs: RTGGX_BENCH_RES (default 1280x720), RTGGX_BENCH_FRAMES,
RTGGX_BENCH_TIMEOUT (s), RTGGX_BENCH_TRAVERSAL, RTGGX_BENCH_CONFIG
(1-5: BASELINE.md benchmark configs; default 0 = headline workload).
Run `python bench.py --all-configs` for one JSON line per BASELINE
config (the driver's single-line contract uses the default mode).
"""

import json
import os
import sys
import time

NORTH_STAR_MRAYS = 1920 * 1080 * 3 * 60 / 1e6  # 373.2


def _res():
    res = os.environ.get("RTGGX_BENCH_RES", "1280x720")
    w, h = (int(v) for v in res.split("x"))
    return w, h


def _sentinel(note):
    w, h = _res()
    return {"metric": f"mrays_per_s_per_chip_e2e_{w}x{h}", "value": 0.0,
            "unit": "Mrays/s", "vs_baseline": 0.0, "note": note[:400]}


def child():
    w, h = _res()
    frames = int(os.environ.get("RTGGX_BENCH_FRAMES", "8"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    plat = os.environ.get("RTGGX_BENCH_PLATFORM")
    if plat:  # testing escape hatch (e.g. cpu smoke test of the bench path)
        os.environ["JAX_PLATFORMS"] = plat
        import jax
        jax.config.update("jax_platforms", plat)
    from raytracedggx_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    mesh = "/root/reference/Bin/Assets/bunny.obj"
    env_path = "/root/reference/Bin/Assets/rnl_cross.dds"
    env = None
    if os.path.exists(env_path):
        from raytracedggx_tpu.io.dds import load_cubemap_env
        env = load_cubemap_env(env_path)

    scene = Scene.create(mesh if os.path.exists(mesh) else None)
    cfg = RenderConfig(width=w, height=h,
                       traversal=os.environ.get("RTGGX_BENCH_TRAVERSAL",
                                                "auto"))
    r = Renderer(scene, env=env, config=cfg)
    state = r.init_state()

    # warmup / compile; also measures the live-ray mix for the Mrays metric
    state, frame, aux = r.step(state)
    frame.block_until_ready()
    hit = np.asarray(aux["normal"][..., 3]) > 0.5
    metal = np.asarray(aux["rough_metal"][..., 1])
    refl_rays = int(hit.sum())
    diff_rays = int((hit & (metal < 1.0)).sum())
    rays_per_frame = w * h + refl_rays + diff_rays

    t0 = time.time()
    for _ in range(frames):
        state, frame, _ = r.step(state)
    # force full materialization on the host — block_until_ready alone has
    # proven unreliable on the tunneled backend
    np.asarray(frame)
    dt = (time.time() - t0) / frames

    mrays = rays_per_frame / dt / 1e6
    print(json.dumps({
        "metric": f"mrays_per_s_per_chip_e2e_{w}x{h}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 5),
        "note": (f"{dt * 1e3:.1f} ms/frame; live rays/frame "
                 f"{rays_per_frame} (refl {refl_rays}, diff {diff_rays})"),
    }))


def main():
    if "--child" in sys.argv:
        # watchdog inside the child as well: a backend stall mid-measure
        # still lets the parent's timeout fire, but this exits sooner
        import signal

        def _timeout(signum, frame):
            sys.stderr.write("child watchdog expired\n")
            os._exit(3)

        signal.signal(signal.SIGALRM, _timeout)
        signal.alarm(max(10, int(os.environ.get("RTGGX_BENCH_TIMEOUT",
                                                "2400")) - 15))
        child()
        return

    import subprocess
    timeout = int(os.environ.get("RTGGX_BENCH_TIMEOUT", "2400"))
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, timeout=timeout)
        for line in reversed((p.stdout or "").strip().splitlines()):
            try:
                obj = json.loads(line)
                if "metric" in obj:
                    print(line)
                    return
            except (json.JSONDecodeError, ValueError):
                continue
        err_tail = (p.stderr or "").strip().splitlines()[-3:]
        print(json.dumps(_sentinel(
            f"bench child rc={p.returncode}: " + " | ".join(err_tail))))
    except subprocess.TimeoutExpired:
        print(json.dumps(_sentinel(
            f"timeout after {timeout}s (TPU tunnel unreachable?)")))
    except Exception as e:  # noqa: BLE001 — the JSON line must survive
        print(json.dumps(_sentinel(f"bench harness error: {e!r}")))


if __name__ == "__main__":
    main()
