"""A/B the bounce-wave sort key's direction-class width (sort_dir_bits
3 vs 6 — ops/traverse_pallas.sort_rays_morton) on the real frame.

Usage: python scripts/abdir.py [frames_per_chunk] [chunks]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.scene import Scene

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")

    for bits in (3, 6):
        r = Renderer(scene, env=env,
                     config=RenderConfig(width=1280, height=720,
                                         sort_dir_bits=bits))
        state = r.init_state()
        state, frame = r.step_n(state, chunk)       # compile + warm
        np.asarray(frame)
        times = []
        for _ in range(chunks):
            t0 = time.time()
            state, frame = r.step_n(state, chunk)
            np.asarray(frame)
            times.append((time.time() - t0) / chunk * 1e3)
        print(f"dir_bits={bits}: "
              f"{min(times):6.2f} ms/frame (runs: "
              f"{' '.join(f'{t:.1f}' for t in times)})", flush=True)


if __name__ == "__main__":
    main()
