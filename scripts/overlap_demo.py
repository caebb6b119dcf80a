"""Demonstrate pipeline overlap — the reference's dual-queue analog
(VERDICT r2 item 6; RayTracedGGX.cpp:304-339 semaphore chain).

The TPU has ONE TensorCore compute queue, so the reference's
compute-queue-vs-graphics-queue overlap cannot exist literally.  The
hardware's second "queue" is the async DMA engines, and the host is a
third pipeline stage.  This script demonstrates both overlaps with
measurements:

1. DEVICE: walk a jax.profiler xplane of a real frame and sum the time
   the 'Async XLA Ops' lane (DMA copies: HBM<->VMEM prefetches, the
   TLAS/ray upload) is busy WHILE the 'XLA Ops' compute lane is busy —
   concurrent execution of two device engines within one frame.
2. HOST: run_frames(frames_in_flight=1 vs 3): with 3 frames in flight
   the host prepares + enqueues frame N+1 while the device renders N
   (FrameCount=3 fencing, RayTracedGGX.cpp:684-717); the wall-clock
   delta IS the overlapped host/dispatch time.

Run on TPU: python scripts/overlap_demo.py [frames]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402


def build():
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.scene import Scene

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    return Renderer(scene, env=env,
                    config=RenderConfig(width=1280, height=720))


def device_overlap(r, logdir="/tmp/rtggx-overlap-trace"):
    """Measure concurrent busy-time of the compute lane and the async
    DMA lane inside one traced dispatch."""
    import glob
    import gzip

    import jax
    from jax.profiler import ProfileData

    state = r.init_state()
    state, frame, _ = r.step(state)
    np.asarray(frame)
    jax.profiler.start_trace(logdir)
    state, frame, _ = r.step(state)
    np.asarray(frame)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    raw = open(paths[-1], "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    prof = ProfileData.from_serialized_xspace(raw)

    def intervals(lane_key):
        out = []
        for plane in prof.planes:
            if "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                if lane_key(line.name.lower()):
                    for ev in line.events:
                        out.append((ev.start_ns, ev.start_ns
                                    + ev.duration_ns))
        return merged(out)

    def merged(iv):
        iv = sorted(iv)
        out = []
        for s, e in iv:
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    comp = intervals(lambda n: n == "xla ops")
    dma = intervals(lambda n: "async" in n and "xla ops" in n)

    def total(iv):
        return sum(e - s for s, e in iv)

    # intersection of the two busy sets = concurrent execution
    inter = 0
    j = 0
    for s, e in comp:
        while j < len(dma) and dma[j][1] <= s:
            j += 1
        k = j
        while k < len(dma) and dma[k][0] < e:
            inter += min(e, dma[k][1]) - max(s, dma[k][0])
            k += 1
    ms = 1e-6
    print(f"compute lane busy {total(comp) * ms:7.2f} ms, "
          f"DMA lane busy {total(dma) * ms:7.2f} ms, "
          f"CONCURRENT {inter * ms:7.2f} ms "
          f"({100.0 * inter / max(total(comp), 1):.0f}% of compute)",
          flush=True)
    return inter


def host_overlap(r, frames=60):
    for fif in (1, 3):
        r.run_frames(4, frames_in_flight=fif)      # warm
        t0 = time.time()
        r.run_frames(frames, frames_in_flight=fif)
        dtms = (time.time() - t0) / frames * 1e3
        print(f"frames_in_flight={fif}: {dtms:7.2f} ms/frame", flush=True)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    r = build()
    device_overlap(r)
    host_overlap(r, frames)


if __name__ == "__main__":
    main()
