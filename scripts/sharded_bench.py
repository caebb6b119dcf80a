"""Sharded-path TPU bench (VERDICT r3 item 8a): run the shard_map frame
step on a REAL TPU mesh (1 chip here — the only hardware available) so
the collective graph itself is TPU-compiled and measured, not just
CPU-dryrun-validated.

With one device the ppermute ring is a self-shift, but the compiled
program is the same shard_map graph the 8-chip mesh runs: halo
exchange, edge masking, band-local filters.  The measured delta vs the
single-chip renderer prices the sharding overhead (halo recompute rows
+ collective + band bookkeeping) with real hardware numbers, making the
8-chip projection an estimate with inputs (VERDICT r3 item 8b; see
docs/PERF.md "Multi-chip story").

Usage: python scripts/sharded_bench.py [frames]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402

W, H = 1280, 720


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240

    import jax

    from raytracedggx_tpu.engine import Renderer, RenderConfig
    from raytracedggx_tpu.io.dds import load_cubemap_env
    from raytracedggx_tpu.parallel.sharded import (ShardedRenderer,
                                                   make_row_mesh)
    from raytracedggx_tpu.scene import Scene

    env = load_cubemap_env("/root/reference/Bin/Assets/rnl_cross.dds")
    scene = Scene.create("/root/reference/Bin/Assets/bunny.obj")
    cfg = RenderConfig(width=W, height=H)

    n = len(jax.devices())
    mesh = make_row_mesh(jax.devices())
    print(f"devices: {n} ({jax.devices()[0].platform})", flush=True)

    for halo in (32, 16):
        r = ShardedRenderer(scene, mesh=mesh, halo=halo, env=env,
                            config=cfg)
        state = r.init_state()
        state, frame, _ = r.step(state)         # compile + warm
        np.asarray(frame)
        t0 = time.time()
        for _ in range(frames):
            state, frame, _ = r.step(state)
        np.asarray(frame)
        dt = (time.time() - t0) / frames * 1e3
        print(f"sharded n={n} halo={halo}: {dt:.1f} ms/frame "
              f"(band {r.band} + 2x{r.halo} halo rows)", flush=True)

    # single-chip reference point, same measurement shape (per-frame
    # dispatch, pipelined) so the delta isolates the sharding overhead
    r1 = Renderer(scene, env=env, config=cfg)
    s = r1.init_state()
    s, frame, _ = r1.step(s)
    np.asarray(frame)
    t0 = time.time()
    for _ in range(frames):
        s, frame, _ = r1.step(s)
    np.asarray(frame)
    dt1 = (time.time() - t0) / frames * 1e3
    print(f"single-chip (per-frame dispatch): {dt1:.1f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
