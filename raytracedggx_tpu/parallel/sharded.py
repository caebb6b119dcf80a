"""Multi-chip rendering: image-row sharding over a device mesh.

The renderer's 'context parallelism' (SURVEY.md §2.5, §5): the pixel domain
is the sequence axis, sharded in row bands across a 1-D ``jax.sharding.Mesh``
via ``shard_map``.  Scene geometry, BVHs and the env probe are replicated
(they are small); each chip renders its band.

Communication design — the only cross-chip dependency is the denoiser:

- ray tracing is pixel-independent: each chip *recomputes* its band plus a
  `halo`-row overlap instead of exchanging ten G-buffer channels; the RNG
  is keyed on global pixel ids (trace/sampling.py) so overlapped rows are
  bit-identical across chips.
- the TAA history (carried state) cannot be recomputed, so its halo rows
  ride ICI via two `ppermute` shifts per frame (`halo_exchange_rows`) —
  the ring-collective analog of the reference's cross-queue semaphores.
- spatial V-filters (radius 16), the TAA 3x3 neighborhood, the velocity
  dilation and the tone-map cross all read within the halo; the halo
  (default 32 rows) must also cover the TAA history reprojection reach
  (|velocity_y| * height), generous for this scene's 16 deg/s animation.

Global image edges keep the single-chip semantics (out-of-bounds = zero)
by masking the wrapped ppermute payloads on the first/last band.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.renderer import Renderer, RenderState

AXIS = "rows"


def make_row_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def halo_exchange_rows(x, halo: int, axis_name: str = AXIS,
                       edge: str = "zero"):
    """Pad a row-band array (Hb, W, ...) with `halo` rows from the ring
    neighbors.  At the global top/bottom the pad is zeros (edge="zero",
    HLSL OOB-load semantics for stencil taps) or the edge row repeated
    (edge="clamp", matching a clamping bilinear sampler — used for the TAA
    history so band-local clamping equals whole-image clamping)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # my top pad = previous device's bottom rows
    top = jax.lax.ppermute(x[-halo:], axis_name, fwd)
    # my bottom pad = next device's top rows
    bot = jax.lax.ppermute(x[:halo], axis_name, bwd)
    if edge == "clamp":
        top_edge = jnp.broadcast_to(x[0:1], top.shape)
        bot_edge = jnp.broadcast_to(x[-1:], bot.shape)
    else:
        top_edge = jnp.zeros_like(top)
        bot_edge = jnp.zeros_like(bot)
    top = jnp.where(idx == 0, top_edge, top)
    bot = jnp.where(idx == n - 1, bot_edge, bot)
    return jnp.concatenate([top, x, bot], axis=0)


class ShardedRenderer(Renderer):
    """Renderer whose frame step runs under shard_map over a row mesh.

    Per-device state: a (H/n, W, 4) history band.  Per-device output: a
    (H/n, W, 3) frame band; the full frame is just the stacked global
    array (jax assembles it as a sharded array).
    """

    def __init__(self, scene, mesh: Mesh | None = None, halo: int = 32,
                 **kw):
        super().__init__(scene, **kw)
        self.mesh = mesh or make_row_mesh()
        self.num_devices = self.mesh.devices.size
        cfg = self.config
        assert cfg.height % self.num_devices == 0, \
            f"height {cfg.height} must divide by {self.num_devices} devices"
        self.band = cfg.height // self.num_devices
        self.halo = int(min(halo, self.band))

        # per-band screen-block ray order (band + halos)
        if self.traversal in ("pallas", "wide"):
            from ..ops.traverse_pallas import block_order
            o, i = block_order(cfg.width, self.band + 2 * self.halo)
            self.band_ray_order = (jnp.asarray(o), jnp.asarray(i))
        else:
            self.band_ray_order = None

        spec_img = P(AXIS)          # shard leading (row) axis
        spec_rep = P()
        state_specs = RenderState(history=spec_img, prev_wvp=spec_rep,
                                  angle=spec_rep, frame=spec_rep)
        self._sharded = jax.jit(
            jax.shard_map(
                self._band_step, mesh=self.mesh,
                in_specs=(state_specs, spec_rep, spec_rep),
                out_specs=(state_specs, spec_img),
                check_vma=False),
            donate_argnums=(0,))

    def _band_step(self, state: RenderState, dt, rough_metals):
        """Runs per device on its row band (history: (band, W, 4))."""
        from ..bvh import build_tlas
        from ..trace.raygen import ray_trace_pass

        cfg = self.config
        halo = self.halo
        band = self.band
        idx = jax.lax.axis_index(AXIS)

        angle = state.angle + jnp.float32(16.0 * np.pi / 180.0) * dt
        consts, worlds, wvp = self._constants(state, angle)
        mats = self.materials._replace(rough_metals=rough_metals)
        tlas = build_tlas(list(self.geom.blas), worlds,
                          mesh_ids=self.scene.mesh_ids)

        # the fused instanced kernel serves each band too: the refit is
        # tiny (instance boxes + inverse table) and replicated per device
        trace_fused = None
        if self.traversal == "wide":
            from ..ops.scene_wide import (refit_scene_wide,
                                          trace_scene_wide_fused)
            sw = refit_scene_wide(self.swide, worlds)
            trace_fused = (lambda o, d, tmin, tmax:
                           trace_scene_wide_fused(sw, o, d, tmin, tmax,
                                                  interpret=self._interp))

        # render band + halo overlap (recompute: zero G-buffer traffic)
        row0 = idx * band - halo
        pad_h = band + 2 * halo
        out = ray_trace_pass(self.geom, tlas, consts, mats, self.env,
                             self.sh_coeffs, cfg.width, cfg.height,
                             bary_mode=cfg.bary_mode, row0=row0,
                             band_height=pad_h, trace_fn=self.trace_fn,
                             trace_fused=trace_fused,
                             ray_order=self.band_ray_order)
        # rows outside the global image behave as OOB zeros
        rows_glob = row0 + jnp.arange(pad_h)
        valid = ((rows_glob >= 0) & (rows_glob < cfg.height)
                 )[:, None, None].astype(jnp.float32)

        hist_pad = halo_exchange_rows(state.history, halo, edge="clamp")
        accum_pad, frame_pad = self._post_process(
            out, hist_pad, valid=valid, full_size=(cfg.width, cfg.height))

        accum = accum_pad[halo:halo + band]
        frame = frame_pad[halo:halo + band]

        new_state = RenderState(history=accum, prev_wvp=wvp, angle=angle,
                                frame=state.frame + 1)
        return new_state, frame

    def init_state(self) -> RenderState:
        cfg = self.config
        worlds = self.scene.worlds(0.0)
        wvp = jnp.einsum("ijk,kl->ijl", worlds, self.view_proj)
        from jax.sharding import NamedSharding
        hist = jax.device_put(
            jnp.zeros((cfg.height, cfg.width, 4), jnp.float16),
            NamedSharding(self.mesh, P(AXIS)))
        return RenderState(history=hist, prev_wvp=wvp,
                           angle=jnp.zeros((), jnp.float32),
                           frame=jnp.zeros((), jnp.int32))

    def step(self, state: RenderState, dt: float = 1 / 60):
        new_state, frame = self._sharded(state, jnp.float32(dt),
                                         self.materials.rough_metals)
        return new_state, frame, None
