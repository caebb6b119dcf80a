"""Per-op device timeline of one renderer dispatch, from a jax.profiler
trace (the GPU-timestamp-query analog, SURVEY.md §5).  Captures a
step_n(CHUNK) dispatch — the deployment shape bench.py measures — and
prints the top ops by total device time, grouped by fusion/kernel name.

Usage: python scripts/profile_xla.py [WxH] [chunk]
"""

import collections
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402


def capture(res="1280x720", chunk=10, logdir="/tmp/rtggx-xla-trace"):
    import jax

    from raytracedggx_tpu.scene import Scene
    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env

    w, h = (int(v) for v in res.split("x"))
    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    r = Renderer(scene, env=env, config=RenderConfig(width=w, height=h))
    state = r.init_state()
    state, frame = r.step_n(state, chunk)      # compile + warm
    np.asarray(frame)

    jax.profiler.start_trace(logdir)
    state, frame = r.step_n(state, chunk)
    np.asarray(frame)
    jax.profiler.stop_trace()
    return logdir, chunk


def summarize(logdir, chunk, top=40):
    """Walk the xplane: sum device-lane event durations by op name."""
    import glob
    import gzip

    from jax.profiler import ProfileData

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane under {logdir}"
    raw = open(paths[-1], "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    prof = ProfileData.from_serialized_xspace(raw)

    ms = 1e-6
    total_by_op = collections.Counter()
    for plane in prof.planes:
        pname = plane.name.lower()
        if "tpu" not in pname and "device" not in pname:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if any(k in lname for k in ("step", "framework", "source",
                                        "host")):
                continue
            tot = sum(ev.duration_ns for ev in line.events)
            print(f"lane '{line.name}': {tot * ms / chunk:.2f} ms/frame",
                  flush=True)
            # the op table uses ONLY the "XLA Ops" lane; events NEST
            # (while/cond spans contain their children), so compute
            # SELF time per event by subtracting contained child spans
            # via an interval sweep — self-times are additive and sum
            # to ~the Modules wall clock.  Async DMA spans (copy-start/
            # slice-start/...-done) only PARTIALLY overlap compute ops
            # (issue before, complete after), which breaks the nesting
            # sweep and mis-attributes idle-looking time to them — and
            # their real cost rides the (overlapped) DMA engines anyway
            # (scripts/overlap_demo.py measures that).  Exclude them so
            # the table is the COMPUTE budget.
            if "xla ops" not in lname:
                continue
            dma = ("copy-start", "copy-done", "slice-start", "slice-done",
                   "send", "recv")
            evs = sorted(((ev.start_ns, ev.end_ns, ev.name)
                          for ev in line.events
                          if not ev.name.lstrip("%").startswith(dma)),
                         key=lambda e: (e[0], -e[1]))
            stack = []      # [start_ns, end_ns, name, child_ns]

            def close(top):
                dur = top[1] - top[0]
                total_by_op[top[2]] += dur - top[3]
                if stack:
                    stack[-1][3] += dur

            for s, e, name in evs:
                while stack and stack[-1][1] <= s:
                    close(stack.pop())
                stack.append([s, e, name, 0])
            while stack:
                close(stack.pop())
    grand = sum(total_by_op.values())
    print(f"XLA-Ops lane SELF-time total {grand * ms:.1f} ms over "
          f"{chunk} frames ({grand * ms / chunk:.2f} ms/frame)")
    print(f"{'op':72s} {'ms/frame':>9s} {'%':>6s}")
    for name, ns in total_by_op.most_common(top):
        print(f"{name[:72]:72s} {ns * ms / chunk:9.3f} "
              f"{100.0 * ns / max(grand, 1):6.2f}")


if __name__ == "__main__":
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    logdir, chunk = capture(res, chunk)
    summarize(logdir, chunk)
