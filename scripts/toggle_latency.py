"""Measure the runtime 'V' toggle cost on real TPU (VERDICT r4 item 8).

Renderer.set_kernels drops the jit caches (the filter choice is baked
into the traced program), so the next step recompiles.  The ISA-keyed
persistent compilation cache (utils/cache.py) is supposed to make repeat
toggles cheap — this measures both: the first-ever toggle (true compile)
and the toggle back (cache hit), plus the steady-state step time in each
variant.

Usage: python scripts/toggle_latency.py [WxH]
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    w, h = (int(v) for v in res.split("x"))

    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.scene import Scene

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    r = Renderer(scene, env=env, config=RenderConfig(width=w, height=h))
    state = r.init_state()

    def timed_step(tag):
        nonlocal state
        t0 = time.time()
        state, frame, _ = r.step(state)
        np.asarray(frame)
        dt = (time.time() - t0) * 1e3
        print(f"{tag:28s} {dt:9.1f} ms", flush=True)

    timed_step("first step (compile)")
    timed_step("steady pallas")
    start = r.kernels
    other = "xla" if start == "pallas" else "pallas"
    t0 = time.time()
    r.set_kernels(other)
    timed_step(f"toggle -> {other} (1st ever)")
    timed_step(f"steady {other}")
    r.set_kernels(start)
    timed_step(f"toggle back -> {start}")
    timed_step(f"steady {start}")
    r.set_kernels(other)
    timed_step(f"toggle -> {other} (repeat)")


if __name__ == "__main__":
    main()
