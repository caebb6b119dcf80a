"""Profiling hooks — the PIX-marker / GPU-timestamp analog (SURVEY.md §5).

The reference instruments passes with PIX markers (XUSG.h:1365-1367) and
ships WinPixEventRuntime; here `trace_frames` captures a jax.profiler trace
viewable in TensorBoard/Perfetto, and `time_stages` reports wall-clock per
pipeline stage by blocking on stage outputs (the timestamp-query analog).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace_frames(logdir: str = "/tmp/rtggx-trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_stages(renderer, state, dt: float = 1 / 60) -> dict:
    """Per-stage wall times (ms) for one frame, by jitting each stage
    separately and blocking on its outputs."""
    import jax

    from ..bvh import build_tlas
    from ..denoise import (reflection_spatial_filter,
                           diffuse_spatial_filter, temporal_ss)
    from ..post import tone_map
    from ..trace.raygen import ray_trace_pass, primary_surface

    r = renderer
    cfg = r.config
    consts, worlds, wvp = r._constants(state, state.angle)
    tlas = build_tlas(list(r.geom.blas), worlds,
                      mesh_ids=r.scene.mesh_ids)
    # bind EXACTLY what _frame_core binds: the fused instanced tracer with
    # sorted-domain shading for "wide" (round-2 verdict: the old compat
    # wrapper profiled a pipeline frames never run)
    trace_fn = r.trace_fn
    trace_fused = None
    if r.traversal == "wide":
        from ..ops.scene_wide import (refit_scene_wide,
                                      trace_scene_wide_fused)
        sw = jax.jit(lambda w: refit_scene_wide(r.swide, w))(worlds)
        trace_fused = (lambda o, d, tmin, tmax:
                       trace_scene_wide_fused(sw, o, d, tmin, tmax,
                                              interpret=r._interp))
        trace_fn = None
    sort_secondary = (cfg.sort_secondary
                      and r.traversal in ("pallas", "wide", "pallas4"))

    def bench(name, fn):
        out = jax.block_until_ready(fn())
        t0 = time.time()
        out = jax.block_until_ready(fn())
        return out, (time.time() - t0) * 1000.0

    times = {}
    f_prim = jax.jit(lambda: primary_surface(
        r.geom, tlas, consts, r.materials, cfg.width, cfg.height,
        trace_fn=trace_fn, trace_fused=trace_fused,
        ray_order=r.ray_order)["hit"])
    _, times["primary_ms"] = bench("primary", f_prim)

    f_trace = jax.jit(lambda: ray_trace_pass(
        r.geom, tlas, consts, r.materials, r.env, r.sh_coeffs,
        cfg.width, cfg.height, trace_fn=trace_fn,
        trace_fused=trace_fused, sort_secondary=sort_secondary,
        ray_order=r.ray_order))
    out, times["trace_total_ms"] = bench("trace", f_trace)

    refl, diff, normal = out["refl"], out["diff"], out["normal"]
    rough = out["rough_metal"][..., 0]
    metal = out["rough_metal"][..., 1]
    f_sp = jax.jit(lambda: diffuse_spatial_filter(
        diff, reflection_spatial_filter(refl, normal, rough, out["depth"],
                                        cfg.width, cfg.height,
                                        impl=r.kernels,
                                        interpret=r.kernels_interpret),
        normal, metal, out["depth"], impl=r.kernels,
        interpret=r.kernels_interpret))
    flt, times["spatial_ms"] = bench("spatial", f_sp)

    f_taa = jax.jit(lambda: tone_map(
        temporal_ss(flt, state.history, out["velocity"])))
    _, times["temporal_tonemap_ms"] = bench("taa", f_taa)
    return times
