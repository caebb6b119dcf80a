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


ASSETS = "/root/reference/Bin/Assets"

# BASELINE.md benchmark configs (config 0 = the driver's headline workload)
CONFIGS = {
    0: dict(name="headline_bunny_full", mesh="bunny.obj", envs=["rnl"],
            res=None, spatial=True, temporal=True, extra=0, animate=True),
    1: dict(name="bunny_static_temporal_720p", mesh="bunny.obj",
            envs=["rnl"], res=(1280, 720), spatial=False, temporal=True,
            extra=0, animate=False),
    2: dict(name="dragon_animated_refit", mesh="dragon.obj", envs=["rnl"],
            res=(1280, 720), spatial=True, temporal=True, extra=0,
            animate=True),
    3: dict(name="full_denoise_both_variants_1080p", mesh="bunny.obj",
            envs=["rnl"], res=(1920, 1080), spatial=True, temporal=True,
            extra=0, animate=True, both_kernel_variants=True),
    4: dict(name="env_sweep_tonemap", mesh="bunny.obj",
            envs=["galileo", "grace", "stpeters", "uffizi", "rnl"],
            res=(1280, 720), spatial=True, temporal=True, extra=0,
            animate=True),
    5: dict(name="4k_multi_instance_async_refit", mesh="bunny.obj",
            envs=["rnl"], res=(3840, 2160), spatial=True, temporal=True,
            extra=6, animate=True, frames=4),
    # r4 (VERDICT item 4): the three-wave frame.  metallic = 0.5 on both
    # meshes arms the diffuse wave (raygenMain traces it only where
    # metallic < 1, RayTracing.hlsl:556-563) — the headline scene's
    # all-metal defaults (RayTracer.cpp:134-139) skip it entirely, so
    # this config is the only one whose cost includes computeDiffuse
    # (:486-535) live.
    6: dict(name="three_wave_metallic05", mesh="bunny.obj", envs=["rnl"],
            res=(1280, 720), spatial=True, temporal=True, extra=0,
            animate=True, metallic=0.5),
}


def _run_config(cfg_id: int):
    """Measure one BASELINE config; returns the JSON record."""
    import numpy as np
    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig

    c = CONFIGS[cfg_id]
    w, h = c["res"] or _res()
    # enough frames that the RUN-fixed tunnel costs (one ~350 ms 11 MB
    # frame download + first-dispatch ramp) don't distort the per-frame
    # mean: at 60 frames they charged ~10 ms/frame (r4: 55.2 ms measured
    # vs 45.8 ms device xplane); at 240 frames bench == device time
    frames = int(os.environ.get("RTGGX_BENCH_FRAMES",
                                c.get("frames", 240)))

    mesh = f"{ASSETS}/{c['mesh']}"
    extra = tuple((2.5 * (i % 3) - 2.5, 0.0, 2.5 * (i // 3) - 2.5, 0.6)
                  for i in range(1, c["extra"] + 1))
    scene = Scene.create(mesh if os.path.exists(mesh) else None,
                         extra_instances=extra)

    envs = []
    for name in c["envs"]:
        path = f"{ASSETS}/{name}_cross.dds"
        if os.path.exists(path):
            from raytracedggx_tpu.io.dds import load_cubemap_env
            envs.append(load_cubemap_env(path))
        else:
            envs.append(None)

    variants = [("auto",)]
    if c.get("both_kernel_variants"):
        variants = [("xla",), ("pallas",)]

    dt_total, notes = 0.0, []
    rays_per_frame = 0
    for (kernels,) in variants:
        for env, env_name in zip(envs, c["envs"]):
            cfg = RenderConfig(
                width=w, height=h, spatial=c["spatial"],
                temporal=c["temporal"], kernels=kernels,
                traversal=os.environ.get("RTGGX_BENCH_TRAVERSAL", "auto"))
            if "RTGGX_BENCH_ANCHOR" in os.environ:   # A/B control knob
                from dataclasses import replace
                cfg = replace(cfg, sort_anchor=int(
                    os.environ["RTGGX_BENCH_ANCHOR"]))
            r = Renderer(scene, env=env, config=cfg)
            if c.get("metallic") is not None:
                for mesh_idx in (0, 1):
                    r.set_metallic(mesh_idx, c["metallic"])
            state = r.init_state()
            anim_dt = 1 / 60 if c["animate"] else 0.0

            # warmup / compile; also measures the live-ray mix
            state, frame, aux = r.step(state, dt=anim_dt)
            frame.block_until_ready()
            hit = np.asarray(aux["normal"][..., 3]) > 0.5
            metal = np.asarray(aux["rough_metal"][..., 1])
            refl_rays = int(hit.sum())
            diff_rays = int((hit & (metal < 1.0)).sum())
            rays_per_frame = w * h + refl_rays + diff_rays

            # scan-chained chunks: one dispatch per CHUNK frames, the
            # deployment shape of a continuous render loop (the tunnel
            # charges ~65 ms of host/queue latency per dispatch — round-3
            # profiler trace)
            chunk = min(30, frames)
            state, frame = r.step_n(state, chunk, dt=anim_dt)  # compile
            np.asarray(frame)
            t0 = time.time()
            done = 0
            while done < frames:
                state, frame = r.step_n(state, chunk, dt=anim_dt)
                done += chunk
            # force full materialization on the host — block_until_ready
            # alone has proven unreliable on the tunneled backend
            np.asarray(frame)
            dt = (time.time() - t0) / done
            dt_total += dt
            tag = kernels if len(variants) > 1 else env_name
            notes.append(f"{tag} {dt * 1e3:.1f}ms")

    dt_mean = dt_total / (len(variants) * len(envs))
    mrays = rays_per_frame / dt_mean / 1e6
    return {
        "metric": f"mrays_per_s_per_chip_e2e_{w}x{h}"
                  + (f"_cfg{cfg_id}" if cfg_id else ""),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 5),
        "note": (f"{CONFIGS[cfg_id]['name']}: {dt_mean * 1e3:.1f} ms/frame"
                 f" ({', '.join(notes)}); live rays/frame "
                 f"{rays_per_frame}"),
    }


def child():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    plat = os.environ.get("RTGGX_BENCH_PLATFORM")
    if plat:  # testing escape hatch (e.g. cpu smoke test of the bench path)
        os.environ["JAX_PLATFORMS"] = plat
        import jax
        jax.config.update("jax_platforms", plat)
    from raytracedggx_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if "--all-configs" in sys.argv:
        for cfg_id in (1, 2, 3, 4, 5, 6):
            print(json.dumps(_run_config(cfg_id)), flush=True)
        return
    print(json.dumps(_run_config(
        int(os.environ.get("RTGGX_BENCH_CONFIG", "0")))))


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
    all_cfgs = "--all-configs" in sys.argv
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"]
            + (["--all-configs"] if all_cfgs else []),
            capture_output=True, text=True, timeout=timeout)
        if all_cfgs:   # one JSON line per BASELINE config, as measured
            emitted = False
            for line in (p.stdout or "").strip().splitlines():
                try:
                    if "metric" in json.loads(line):
                        print(line)
                        emitted = True
                except (json.JSONDecodeError, ValueError):
                    continue
            if not emitted:
                err_tail = (p.stderr or "").strip().splitlines()[-3:]
                print(json.dumps(_sentinel(
                    f"bench child rc={p.returncode}: "
                    + " | ".join(err_tail))))
            return
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
