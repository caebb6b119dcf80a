"""Frame orchestration: the RayTracedGGX app loop as one jitted step.

Replaces the reference's per-frame host choreography — OnUpdate
(RayTracedGGX.cpp:282-299), the 4-submission dual-queue OnRender
(:302-353), RayTracer::UpdateFrame (RayTracer.cpp:250-305) and
UpdateAccelerationStructure (:326-341), Denoiser::Denoise/ToneMap — with a
single functional step: ``state -> (state, frame)``.  Command lists,
barriers and the semaphore chain dissolve into XLA dataflow; queue overlap
becomes XLA async dispatch (the host never blocks until it reads a frame);
triple buffering becomes keeping N frames in flight before blocking on
device results (run_frames).

Per frame (mirroring RayTracer::UpdateFrame):
- advance the model rotation 16 deg/s * dt (RayTracer.cpp:270-272)
- Halton sub-pixel jitter: projBias = (h*2-1)/viewport (RayTracer.cpp:253-258)
- rebuild WVPs, keep previous-frame WVPs for motion vectors
- TLAS refit (instance transforms + world AABBs)
- ray trace -> denoise (spatial H/V refl+diff, temporal accumulate) ->
  tone map
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh import build_tlas
from ..denoise import (reflection_spatial_filter, diffuse_spatial_filter,
                       temporal_ss)
from ..post import tone_map
from ..scene.camera import Camera
from ..sh import project_sh9
from ..trace.env import EnvMap, procedural_env
from ..trace.geometry import upload_scene
from ..trace.raygen import FrameConstants, MaterialsDev, ray_trace_pass
from ..utils import math3d as m3
from ..utils.formats import quantize_r11g11b10, quantize_unorm, quantize_f16
from ..utils.halton import halton_table

ANIM_SPEED = 16.0 * np.pi / 180.0   # 16 deg/s (RayTracer.cpp:271)
JITTER_TABLE = 1024
RNG_FRAMES = 256                    # FrameIndex mod (RayTracer.cpp:295)


@dataclass(frozen=True)
class RenderConfig:
    width: int = 1280
    height: int = 720
    bary_mode: str = "direct"       # or "ndc" (reference reconstruction)
    spatial: bool = True            # spatial filters on/off
    temporal: bool = True           # TAA accumulate on/off
    emulate_formats: bool = False   # round-trip reference storage precision
    kernels: str = "auto"           # "auto" | "xla" | "pallas" spatial-
                                    # filter impl (the 'V' toggle analog);
                                    # auto = pallas on TPU (measured ~20 ms
                                    # faster @720p, round-3 ablation), xla
                                    # elsewhere (interpret mode is slow)
    traversal: str = "auto"         # "auto" | "wide" | "pallas4" |
                                    # "pallas" | "jax"
    leaf_size: int = 8              # FlatBVH leaf collapse for Pallas
    wide_leaf_size: int = 64        # scene-wide kernel leaf size.  Under
                                    # the binned-SAH subtree builder big
                                    # leaves win: L64 beats L16 by ~15%
                                    # on both waves (fewer pops amortize
                                    # the per-iteration fixed cost; SAH
                                    # keeps the unions tight) — kbench
                                    # L8/16/32/64/128 sweep, round 3
    sort_secondary: bool = True     # morton+octant sort for bounce waves
    sort_dir_bits: int = 3          # direction-class bits in the bounce
                                    # sort key (3 = octant; 6 = ~30 deg
                                    # cones — A/B knob, traverse_pallas)
    sort_anchor: int = 0            # ~K-node BVH cut per mesh whose
                                    # nearest-entry id joins the bounce
                                    # sort key (frontier re-binning).
                                    # Priced r5 and default OFF: the
                                    # ISOLATED kernel wins -19% (20.7 ->
                                    # 16.8 ms, anchorbench) but the e2e
                                    # frame LOSES +2.3 ms (45.1 -> 47.4;
                                    # octant-first layout 47.6) — anchor
                                    # math ~1.5 ms + in-branch shading
                                    # gathers decohere.  docs/PERF.md r5
    dbg_no_refl_trace: bool = False   # ablation knobs for differential
    dbg_no_secondary_shade: bool = False  # frame profiling (profile_frame)
    dbg_env_mode: str = "full"        # "no_env" | "bilinear" ablations
    secondary_bucket: float = 0.222  # live-prefix fraction for secondary
                                    # waves: trace/shade/permute only a
                                    # static bucket of the sorted wave
                                    # (dead rays sort last); lax.cond
                                    # falls back to the full wave when
                                    # live rays overflow.  0 disables.
                                    # Sized from the measured worst-case
                                    # live reflection wave over a full
                                    # rotation (scripts/livefrac.py r4:
                                    # bunny 18.25%, dragon 20.31%) +
                                    # ~9% margin; 0.222 rounds to 25
                                    # kernel tiles @720p, 57 @1080p
    dbg_miss_lod: float = 0.0       # env LOD for primary-miss radiance
                                    # (reference semantics = 0; fidelity
                                    # A/B knob, scripts/fidelity_ab.py)
    trace_slim: bool = False        # deferred-attribute traversal kernel
                                    # (ops/fused.py slim): the kernel
                                    # tracks only (t, slot, inst); u/v
                                    # recomputed post-kernel from the
                                    # attrs gather.  A/B knob until the
                                    # kernel-lab pricing lands (r5)
    async_compute: bool = False     # 'A' toggle analog: TLAS refit as its
                                    # own dispatched program vs fused into
                                    # the frame program (identical output).
                                    # Default OFF: on a single chip the
                                    # split buys no overlap and measurably
                                    # costs ~11 ms/frame @720p in dispatch
                                    # + transfer overhead (profile_frame,
                                    # round 2); multi-chip deployments can
                                    # re-enable it


class RenderState(NamedTuple):
    history: jnp.ndarray        # (H, W, 4) f16 TSS accumulation (prev
                                # frame) — the reference's RGBA16F
                                # TemporalSSOut (Denoiser.cpp:46-56);
                                # f16 storage halves the scan-carry and
                                # resample bytes (r5, VERDICT item 5)
    prev_wvp: jnp.ndarray       # (I, 4, 4)
    angle: jnp.ndarray          # () animation angle
    frame: jnp.ndarray          # () int32 absolute frame counter


class Renderer:
    def __init__(self, scene, camera: Camera | None = None,
                 env: EnvMap | None = None,
                 config: RenderConfig | None = None):
        self.config = config or RenderConfig()
        self.scene = scene
        self.camera = camera or Camera(width=self.config.width,
                                       height=self.config.height)
        self.camera.width = self.config.width
        self.camera.height = self.config.height
        self.env = env if env is not None else procedural_env(64)
        self.geom = upload_scene(scene, leaf_size=self.config.leaf_size)

        # traversal backend: the Pallas packet kernel on TPU, the pure-JAX
        # stack traversal elsewhere ("auto")
        self._anchor_bits = 0
        from ..trace.raygen import default_tracer, pallas_tracer
        mode = self.config.traversal
        if mode == "auto":
            mode = "wide" if jax.default_backend() == "tpu" else "jax"
        self.traversal = mode
        # forced pallas off-TPU runs the kernel in interpreter mode
        interp = (mode.startswith("pallas") or mode == "wide") \
            and jax.default_backend() != "tpu"
        self._interp = interp
        if mode == "wide":
            # unified instanced scene BVH: one kernel launch per wave
            # regardless of instance count; shared object-space mesh
            # subtrees (each mesh resident ONCE) entered via tagged
            # instance nodes (ops/scene_wide.py).  The streams must be
            # VMEM-resident (~16 MB/core); fall back to the per-mesh
            # object-space kernel when the UNIQUE meshes exceed budget.
            est = 0
            L = self.config.wide_leaf_size
            for m in set(scene.mesh_ids):
                tris = self.geom.meshes[m].tri.shape[0]
                leaves = -(-int(tris) * 8 // (6 * L))  # ~6/8 leaf fill
                est += leaves * (9 * L) * 4            # lean leaf columns
                est += -(-leaves // 3) * 36 * 4        # supernode columns
            if est > 12 * 2 ** 20:
                if self.config.traversal == "wide":
                    raise ValueError(
                        f"traversal='wide' requested but the scene's "
                        f"unique-mesh streams (~{est / 2 ** 20:.1f} MB) "
                        f"exceed the VMEM budget; use traversal='pallas4' "
                        f"or a larger leaf_size")
                import warnings
                warnings.warn(
                    f"scene streams ~{est / 2 ** 20:.1f} MB exceed the "
                    f"VMEM budget; falling back to per-mesh launches "
                    f"(traversal='pallas4')", stacklevel=2)
                mode = self.traversal = "pallas4"
        if mode == "wide":
            from ..ops.scene_wide import anchor_bits, build_scene_wide
            self.swide = build_scene_wide(
                self.geom, scene.mesh_ids,
                leaf_size=self.config.wide_leaf_size,
                anchor_cut=self.config.sort_anchor)
            self._anchor_bits = (anchor_bits(self.swide)
                                 if self.config.sort_anchor else 0)
            self.trace_fn = None       # bound per frame after the refit
        elif mode == "pallas4":
            from ..ops.wide import flatten_bvh4, trace_scene_pallas4
            wides = tuple(
                flatten_bvh4(b, m.v0, m.e1, m.e2,
                             leaf_size=self.config.leaf_size)
                for b, m in zip(self.geom.blas, self.geom.meshes))
            self.trace_fn = (lambda tlas, o, d, tmin, tmax:
                             trace_scene_pallas4(wides, tlas, o, d, tmin,
                                                 tmax, interpret=interp))
        elif mode == "pallas":
            self.trace_fn = pallas_tracer(self.geom, interpret=interp)
        else:
            self.trace_fn = default_tracer(self.geom)
        # pallas FILTER kernels likewise interpret off-TPU
        self.kernels = self.config.kernels
        if self.kernels == "auto":
            self.kernels = ("pallas" if jax.default_backend() == "tpu"
                            else "xla")
        self.kernels_interpret = (self.kernels == "pallas"
                                  and jax.default_backend() != "tpu")

        # screen-block ray ordering keeps kernel tile frusta compact;
        # aligned viewports get the reshape-based BlockOrder (no gathers)
        from ..ops.traverse_pallas import make_block_order
        if mode.startswith("pallas") or mode == "wide":
            bo = make_block_order(self.config.width, self.config.height)
            if isinstance(bo, tuple):
                bo = (jnp.asarray(bo[0]), jnp.asarray(bo[1]))
            self.ray_order = bo
        else:
            self.ray_order = None

        # SH projection of the env probe (reference: first-frame
        # TransformSH, RayTracer.cpp:345-350 — here folded into init)
        s0 = int(np.asarray(self.env.sizes[0]))
        mip0 = np.asarray(self.env.data[:6 * s0 * s0]).reshape(6, s0, s0, 3)
        self.sh_coeffs = project_sh9(jnp.asarray(mip0))

        inst_mats = scene.instance_materials()
        self.materials = MaterialsDev(
            base_colors=jnp.asarray(inst_mats.base_colors),
            rough_metals=jnp.asarray(inst_mats.rough_metals))

        self.view_proj = jnp.asarray(self.camera.view_proj())
        self.proj_to_world = m3.inverse(self.view_proj)
        self.eye = jnp.asarray(self.camera.eye, jnp.float32)
        self.jitter = jnp.asarray(halton_table(JITTER_TABLE))

        self._step = jax.jit(partial(self._frame_step),
                             static_argnames=(), donate_argnums=(0,))
        self._step_n_cache = {}
        # 'A' toggle: TLAS refit as its own dispatched program (the
        # compute-queue submission analog, RayTracedGGX.cpp:304-339)
        self._refit = jax.jit(self._refit_step)
        self._render = jax.jit(self._render_step, donate_argnums=(0,))

    # -- functional core ---------------------------------------------------

    def init_state(self) -> RenderState:
        cfg = self.config
        worlds = self.scene.worlds(0.0)
        wvp = jnp.einsum("ijk,kl->ijl", worlds, self.view_proj)
        return RenderState(
            history=jnp.zeros((cfg.height, cfg.width, 4), jnp.float16),
            prev_wvp=wvp,
            angle=jnp.zeros((), jnp.float32),
            frame=jnp.zeros((), jnp.int32),
        )

    def _constants(self, state: RenderState, angle, cam=None):
        """cam: optional (view_proj, proj_to_world, eye) runtime arrays
        overriding the construction-time camera — lets a camera sweep
        (scripts/validate_reference.py orbit search) reuse ONE compiled
        frame program for every probe point."""
        view_proj, proj_to_world, eye = (
            cam if cam is not None
            else (self.view_proj, self.proj_to_world, self.eye))
        worlds = self.scene.worlds(angle)
        wvp = jnp.einsum("ijk,kl->ijl", worlds, view_proj)
        h2 = self.jitter[state.frame % JITTER_TABLE]
        bias = (h2 * 2.0 - 1.0) / jnp.asarray(
            [self.config.width, self.config.height], jnp.float32)
        consts = FrameConstants(
            world_view_projs=wvp,
            world_view_projs_prev=state.prev_wvp,
            worlds=worlds,
            world_its=self.scene.normal_matrices(worlds),
            proj_to_world=proj_to_world,
            eye=eye,
            proj_bias=bias,
            frame_index=(state.frame % RNG_FRAMES).astype(jnp.uint32),
            inv_worlds=jnp.stack([m3.inverse(worlds[i])
                                  for i in range(worlds.shape[0])]),
        )
        return consts, worlds, wvp

    def _refit_as(self, worlds):
        """Acceleration-structure refit for the frame's instance
        transforms (RayTracer::UpdateAccelerationStructure).  Returns
        (tlas, wide_arrays): the TLAS always (shading reads instance
        transforms from it); refitted wide-BVH streams when the unified
        world-space traversal is active."""
        tlas = build_tlas(list(self.geom.blas), worlds,
                          mesh_ids=self.scene.mesh_ids)
        wide_arrays = ()
        if self.traversal == "wide":
            from ..ops.scene_wide import refit_scene_wide
            sw = refit_scene_wide(self.swide, worlds)
            wide_arrays = (sw.nodes, sw.inv_mats)
        return tlas, wide_arrays

    def _refit_step(self, state: RenderState, dt):
        """The compute-queue submission: animation + constants + AS
        refit (RayTracer::UpdateFrame + UpdateAccelerationStructure)."""
        angle = state.angle + ANIM_SPEED * dt
        consts, worlds, wvp = self._constants(state, angle)
        tlas, wide_arrays = self._refit_as(worlds)
        # mesh_ids is static python data; return only the array leaves
        return consts, tuple(tlas)[:-1], wide_arrays, wvp, angle

    def _render_step(self, state, rough_metals, consts, tlas_arrays,
                     wide_arrays, wvp, angle):
        from ..bvh.tlas import TLAS
        tlas = TLAS(*tlas_arrays, mesh_ids=self.scene.mesh_ids)
        return self._frame_core(state, rough_metals, consts, tlas,
                                wide_arrays, wvp, angle)

    def _frame_step(self, state: RenderState, dt, rough_metals,
                    cam=None):
        angle = state.angle + ANIM_SPEED * dt
        consts, worlds, wvp = self._constants(state, angle, cam)
        # AS refit — the async-compute-queue update (RayTracer.cpp:326-341)
        tlas, wide_arrays = self._refit_as(worlds)
        return self._frame_core(state, rough_metals, consts, tlas,
                                wide_arrays, wvp, angle)

    def _post_process(self, out, history, valid=None, full_size=None):
        """Denoise + accumulate + tone map (shared by the single-chip and
        sharded paths).  `valid`: optional (H, 1, 1) row mask for sharded
        halo rows outside the global image (OOB-zero semantics).
        Returns (accum, frame)."""
        cfg = self.config
        refl, diff = out["refl"], out["diff"]
        normal, rough_metal = out["normal"], out["rough_metal"]
        depth, velocity = out["depth"], out["velocity"]
        if cfg.emulate_formats:
            refl = quantize_r11g11b10(refl)
            diff = quantize_r11g11b10(diff)
            normal = jnp.concatenate(
                [quantize_unorm(normal[..., :3], 10),
                 quantize_unorm(normal[..., 3:4], 2)], axis=-1)
            rough_metal = quantize_unorm(rough_metal, 8)
            velocity = quantize_f16(velocity)
        if valid is not None:
            refl = refl * valid
            diff = diff * valid
            normal = normal * valid
            rough_metal = rough_metal * valid
            velocity = velocity * valid
            depth = depth * valid[..., 0]

        rough = rough_metal[..., 0]
        metal = rough_metal[..., 1]

        if cfg.spatial:
            flt_rfl = reflection_spatial_filter(
                refl, normal, rough, depth, cfg.width, cfg.height,
                impl=self.kernels, interpret=self.kernels_interpret)
            # The diffuse filter's per-pixel gate is hit & (metal < 1)
            # (CSSpatial_H_Diff.hlsl:35); where the gate fails it passes
            # filtered_refl through unchanged.  When NO pixel gates true
            # (the reference's all-metallic materials), both H/V passes
            # are an exact identity on flt_rfl — the same predicate that
            # skips the diffuse wave (raygen) skips the filter dispatches
            # (~2.5 ms/frame @720p)
            any_diff = jnp.any((normal[..., 3] > 0.0) & (metal < 1.0))
            flt_dff = jax.lax.cond(
                any_diff,
                lambda _: diffuse_spatial_filter(
                    diff, flt_rfl, normal, metal, depth,
                    impl=self.kernels,
                    interpret=self.kernels_interpret),
                lambda _: flt_rfl, None)
        else:
            # temporal-only config (BASELINE config 1): composite directly
            hit = normal[..., 3:4]
            flt_rfl = jnp.concatenate([refl, hit], axis=-1)
            comp = jnp.where(metal[..., None] < 1.0, refl + diff, refl)
            flt_dff = jnp.concatenate([comp, hit], axis=-1)
        if cfg.emulate_formats:
            flt_dff = quantize_f16(flt_dff)

        if cfg.temporal:
            accum = temporal_ss(flt_dff, history, velocity,
                                full_size=full_size)
        else:
            accum = flt_dff
        if cfg.emulate_formats:
            accum = quantize_f16(accum)
        if valid is not None:
            # rows outside the global image read as zeros to the tone map
            accum = accum * valid

        # store at the history dtype (f16 = the reference's RGBA16F
        # TemporalSSOut); the tone map reads the same stored texture
        accum = accum.astype(history.dtype)
        return accum, tone_map(accum.astype(jnp.float32))

    def _frame_core(self, state: RenderState, rough_metals, consts, tlas,
                    wide_arrays, wvp, angle):
        cfg = self.config
        mats = self.materials._replace(rough_metals=rough_metals)

        trace_fn = self.trace_fn
        trace_fused = None
        anchor_fn = None
        anchor_b = 0
        if self.traversal == "wide":
            from ..ops.scene_wide import (anchor_ids_scene,
                                          trace_scene_wide_fused)
            sw = self.swide._replace(nodes=wide_arrays[0],
                                     inv_mats=wide_arrays[1])
            trace_fused = (lambda o, d, tmin, tmax:
                           trace_scene_wide_fused(
                               sw, o, d, tmin, tmax,
                               interpret=self._interp,
                               slim=self.config.trace_slim))
            if self._anchor_bits:
                anchor_fn = (lambda o, d: anchor_ids_scene(sw, o, d))
                anchor_b = self._anchor_bits

        out = ray_trace_pass(self.geom, tlas, consts, mats, self.env,
                             self.sh_coeffs, cfg.width, cfg.height,
                             bary_mode=cfg.bary_mode,
                             trace_fn=trace_fn,
                             trace_fused=trace_fused,
                             ray_order=self.ray_order,
                             sort_secondary=(cfg.sort_secondary and
                                             self.traversal in
                                             ("pallas", "wide", "pallas4")),
                             secondary_bucket=cfg.secondary_bucket,
                             sort_dir_bits=cfg.sort_dir_bits,
                             anchor_fn=anchor_fn, anchor_bits=anchor_b,
                             dbg_no_refl_trace=cfg.dbg_no_refl_trace,
                             dbg_no_secondary_shade=(
                                 cfg.dbg_no_secondary_shade),
                             dbg_env_mode=cfg.dbg_env_mode,
                             dbg_miss_lod=cfg.dbg_miss_lod)

        accum, frame = self._post_process(out, state.history)

        new_state = RenderState(
            history=accum,
            prev_wvp=wvp,
            angle=angle,
            frame=state.frame + 1,
        )
        aux = dict(out, accum=accum)
        return new_state, frame, aux

    # -- host-side loop ----------------------------------------------------

    def step(self, state: RenderState, dt: float = 1 / 60, cam=None):
        """One frame. Non-blocking: returns device arrays immediately
        (XLA async dispatch = the queue-overlap analog).

        async_compute=True issues the TLAS refit and the render as two
        dispatches (the reference's compute-queue + graphics-queue
        submissions); False fuses them into one program (the single-
        command-list path, RayTracedGGX.cpp:340-347).

        cam: optional (view_proj, proj_to_world, eye) arrays overriding
        the construction camera without recompiling (orbit sweeps)."""
        dt = jnp.float32(dt)
        if cam is not None:
            return self._step(state, dt, self.materials.rough_metals,
                              cam)
        if self.config.async_compute:
            consts, tlas_arrays, wide_arrays, wvp, angle = \
                self._refit(state, dt)
            return self._render(state, self.materials.rough_metals,
                                consts, tlas_arrays, wide_arrays, wvp,
                                angle)
        return self._step(state, dt, self.materials.rough_metals)

    def step_n(self, state: RenderState, num_frames: int,
               dt: float = 1 / 60):
        """num_frames frames in ONE dispatch (lax.scan over the frame
        step), returning (state, last_frame).  The deployment shape of a
        continuous render loop: per-dispatch host/tunnel latency (~65 ms
        on the tunneled TPU, round-3 profiler trace) is paid once per
        chunk instead of once per frame."""
        fn = self._step_n_cache.get(num_frames)
        if fn is None:
            def chain(state, dtv, rms):
                h, w = self.config.height, self.config.width

                def body(carry, _):
                    st, _last = carry
                    st2, frame, _aux = self._frame_step(st, dtv, rms)
                    return (st2, frame), None

                init = (state, jnp.zeros((h, w, 3), jnp.float32))
                (state, last), _ = jax.lax.scan(
                    body, init, None, length=num_frames)
                return state, last

            fn = self._step_n_cache[num_frames] = jax.jit(
                chain, donate_argnums=(0,))
        return fn(state, jnp.float32(dt), self.materials.rough_metals)

    def set_kernels(self, kernels: str):
        """Runtime 'V' hotkey analog (RayTracedGGX.cpp:391-393): switch
        the spatial-filter implementation between the XLA stencils and
        the VMEM-tiled Pallas kernels.  The filter choice is baked into
        the traced program, so this drops the jit caches — the next
        step recompiles (the reference swaps to a different prebuilt
        PSO; XLA's analog of the PSO cache is the persistent
        compilation cache, which makes repeat toggles cheap)."""
        if kernels == self.kernels:
            return
        self.kernels = kernels
        self.kernels_interpret = (kernels == "pallas"
                                  and jax.default_backend() != "tpu")
        self._step = jax.jit(partial(self._frame_step), donate_argnums=(0,))
        self._step_n_cache = {}
        self._render = jax.jit(self._render_step, donate_argnums=(0,))

    def set_async_compute(self, on: bool):
        """Runtime 'A' hotkey analog (RayTracedGGX.cpp:394-396): split
        the TLAS refit into its own dispatch vs fuse it into the frame
        program.  Pure host-side dispatch choice — no recompile."""
        from dataclasses import replace
        self.config = replace(self.config, async_compute=bool(on))

    def set_metallic(self, mesh_idx: int, metallic: float):
        """RayTracer::SetMetallic (RayTracer.cpp:243-247). Per-mesh: every
        instance of the mesh updates (instances share mesh materials)."""
        rm = np.asarray(self.materials.rough_metals).copy()
        for inst, mid in enumerate(self.scene.mesh_ids):
            if mid == mesh_idx:
                rm[inst, 1] = np.clip(metallic, 0.0, 1.0)
        self.materials = self.materials._replace(
            rough_metals=jnp.asarray(rm))

    def run_frames(self, num_frames: int, dt: float = 1 / 60,
                   state: RenderState | None = None, frames_in_flight=3):
        """Render N frames with triple-buffered pipelining (the analog of
        FrameCount=3 fencing, RayTracedGGX.cpp:684-717): keep at most
        `frames_in_flight` device computations outstanding."""
        state = state or self.init_state()
        pending = []
        last = None
        for _ in range(num_frames):
            state, frame, _ = self.step(state, dt)
            pending.append(frame)
            if len(pending) > frames_in_flight:
                pending.pop(0).block_until_ready()
            last = frame
        jax.block_until_ready(last)
        return state, last
