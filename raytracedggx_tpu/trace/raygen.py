"""The ray-trace dispatch: raygen + closest-hit + miss, as a wavefront.

TPU-native re-formulation of RayTracing.hlsl (entry raygenMain :540-565,
closestHitReflection :570-590, closestHitDiffuse :592-614, missMain
:619-625) and the DispatchRays call (RayTracer.cpp:807-809).

Because MAX_RECURSION_DEPTH = 1 (RayTracing.hlsl:11), the megakernel's
'recursion' is statically bounded: depth-1 hits never trace again (they fall
back to env/SH lookups in traceRadianceRay/computeDiffuse).  The whole
frame is therefore exactly three ray waves over the pixel grid —

  1. primary cast   -> visibility buffer + G-buffers (replaces the
                       VSVisibility/PSVisibility raster pass + the
                       getPrimarySurface reconstruction)
  2. GGX reflection -> shaded at the hit with the env split-sum or SH terms
  3. cosine diffuse -> shaded likewise (skipped results masked where
                       metallic >= 1, raygenMain:559)

— each a batched trace + gather-shade, with no per-ray control flow.

Primary-surface barycentrics come straight from the ray hit ("direct"),
or optionally via the reference's perspective-correct NDC reconstruction
(calcBarycentrics, RayTracing.hlsl:204-225) for bit-closer raster parity
("ndc").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..sh import evaluate_sh_irradiance
from ..utils.math3d import reflect, saturate
from .brdf import f_schlick, vis_smith, env_brdf_approx, PI
from .env import EnvMap, sample_env
from .geometry import (SceneGeometry, fetch_vertices, interp_attribs,
                       interp_from_vertices)
from .sampling import sample_param, ggx_dir, cos_dir
from .shade import get_uv, get_rough_metal, get_base_color
from .traverse import trace_scene

PRIMITIVE_BITS = 24
T_MIN_SECONDARY = 1e-5
T_MAX = 10000.0


class FrameConstants(NamedTuple):
    """CBGlobal + RayGenConstants (RayTracing.hlsl:46-60), row-vector."""
    world_view_projs: jnp.ndarray       # (I, 4, 4)
    world_view_projs_prev: jnp.ndarray  # (I, 4, 4)
    worlds: jnp.ndarray                 # (I, 4, 4)
    world_its: jnp.ndarray              # (I, 3, 3)
    proj_to_world: jnp.ndarray          # (4, 4) inverse(view @ proj)
    eye: jnp.ndarray                    # (3,)
    proj_bias: jnp.ndarray              # (2,) NDC jitter
    frame_index: jnp.ndarray            # () uint32, mod 256
    inv_worlds: jnp.ndarray = None      # (I, 4, 4) inverse instance worlds
                                        # (fused-traversal shading path)


class MaterialsDev(NamedTuple):
    base_colors: jnp.ndarray    # (I, 4)
    rough_metals: jnp.ndarray   # (I, 2)


def default_tracer(geom: SceneGeometry):
    """trace_fn(tlas, o, d, t_min, t_max) using the pure-JAX traversal."""
    def fn(tlas, o, d, t_min, t_max):
        t_max_s = t_max if jnp.ndim(t_max) == 0 else T_MAX
        rec = trace_scene(geom.blas, geom.tri_data, tlas, o, d, t_min,
                          t_max_s)
        if jnp.ndim(t_max) != 0:   # apply per-ray masking afterwards
            dead = t_max < 0
            rec = rec._replace(hit=rec.hit & ~dead,
                               inst=jnp.where(dead, -1, rec.inst))
        return rec
    return fn


def pallas_tracer(geom: SceneGeometry, interpret: bool = False):
    """trace_fn using the Pallas packet-traversal kernel (ops/)."""
    from ..ops.traverse_pallas import trace_scene_pallas

    def fn(tlas, o, d, t_min, t_max):
        return trace_scene_pallas(geom.flat, tlas, o, d, t_min, t_max,
                                  interpret=interpret)
    return fn


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def take_small(table, idx, num: int):
    """Per-ray fetch from a SMALL (num <= ~32 rows) table via one-hot
    matmul.  Measured equal to a plain gather on TPU (docs/PERF.md round
    2 microbench); kept because the matmul form fuses predictably and
    rides the MXU.  Used for per-instance matrices/materials."""
    import jax

    oh = jax.nn.one_hot(jnp.clip(idx, 0, num - 1), num, dtype=jnp.float32)
    flat = jnp.asarray(table, jnp.float32).reshape(num, -1)
    return (oh @ flat).reshape(idx.shape + table.shape[1:])


def _order_fns(ray_order):
    """(permute, unpermute) for either ordering representation: a static
    BlockOrder (reshape/transpose — streaming copy, no gather) or
    (order, inverse) index arrays (one bundled gather each way; gathers
    cost ~6 ns/row width-independent, so bundling is what matters)."""
    import jax

    from ..ops.traverse_pallas import BlockOrder

    if isinstance(ray_order, BlockOrder):
        return ray_order.permute, ray_order.unpermute
    order, inv = ray_order
    if inv is None:      # lazily built: only non-bucketed paths pay it
        # argsort of a permutation IS its inverse, and the bitonic sort
        # (~1.2 ms @720p) beats the scatter form (~4 ms)
        inv = jnp.argsort(order)
    return (lambda x: jax.lax.optimization_barrier(x[order]),
            lambda x: jax.lax.optimization_barrier(x[inv]))


def _trace_ordered(trace_fn, tlas, o, d, t_min, t_max, ray_order):
    """Trace with an optional ray permutation (2D screen-block order so
    kernel tiles get compact frusta — ops/traverse_pallas.block_order)."""
    if ray_order is None:
        return trace_fn(tlas, o, d, t_min, t_max)
    perm, unperm = _order_fns(ray_order)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    bundle = perm(jnp.concatenate([o, d, tm[:, None]], axis=-1))
    rec = trace_fn(tlas, bundle[:, 0:3], bundle[:, 3:6], t_min,
                   bundle[:, 6])
    fl = unperm(jnp.stack(
        [rec.t, rec.u, rec.v, rec.hit.astype(jnp.float32)], axis=-1))
    ints = unperm(jnp.stack([rec.prim, rec.inst], axis=-1))
    return type(rec)(t=fl[:, 0], prim=ints[:, 0], u=fl[:, 1], v=fl[:, 2],
                     hit=fl[:, 3] > 0.5, inst=ints[:, 1])


def _trace_ordered_fused(trace_fused, o, d, t_min, t_max, ray_order):
    """_trace_ordered for fused tracers returning (HitRecord, normal):
    the interpolated world normal rides the bundled un-permute."""
    from .traverse import HitRecord

    if ray_order is None:
        return trace_fused(o, d, t_min, t_max)
    perm, unperm = _order_fns(ray_order)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    bundle = perm(jnp.concatenate([o, d, tm[:, None]], axis=-1))
    rec, nrm = trace_fused(bundle[:, 0:3], bundle[:, 3:6], t_min,
                           bundle[:, 6])
    fl = unperm(jnp.concatenate(
        [jnp.stack([rec.t, rec.u, rec.v, rec.hit.astype(jnp.float32)],
                   axis=-1), nrm], axis=-1))
    ints = unperm(jnp.stack([rec.prim, rec.inst], axis=-1))
    rec = HitRecord(t=fl[:, 0], prim=ints[:, 0], u=fl[:, 1], v=fl[:, 2],
                    hit=fl[:, 3] > 0.5, inst=ints[:, 1])
    return rec, fl[:, 4:7]


def _trace_shade_ordered_fused(trace_fused, shade_fn, env, o, d, t_min,
                               t_max, ray_order, miss_lod=0.0):
    """Trace AND shade in the sorted ray domain, un-permuting only the
    final radiance.  Shading in sorted order is the whole point: the env
    probe taps of neighboring rays hit neighboring texels (the morton/
    octant sort clusters directions), which measured ~2x cheaper than
    shading after the inverse permute (docs/PERF.md round 2).  Returns
    (radiance (R, 3), secondary_hit (R,)) in original ray order.
    miss_lod: env LOD for miss radiance (reference: 0, missMain
    RayTracing.hlsl:619-625; nonzero is a fidelity-A/B knob only)."""
    import jax

    if ray_order is None:
        rec, nrm = trace_fused(o, d, t_min, t_max)
        shaded, env_tap = shade_fn(rec, nrm, o, d)
        env_rad = (env_tap if env_tap is not None
                   else sample_env(env, d, miss_lod))
        rad = jnp.where(rec.hit[..., None], shaded, env_rad)
        return rad, rec.hit
    perm, unperm = _order_fns(ray_order)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    bundle = perm(jnp.concatenate([o, d, tm[:, None]], axis=-1))
    o_s, d_s = bundle[:, 0:3], bundle[:, 3:6]
    rec, nrm = trace_fused(o_s, d_s, t_min, bundle[:, 6])
    shaded, env_tap = shade_fn(rec, nrm, o_s, d_s)
    # miss radiance, still sorted; rides the shade env tap when unified
    env_rad = (env_tap if env_tap is not None
               else sample_env(env, d_s, miss_lod))
    rad = jnp.where(rec.hit[..., None], shaded, env_rad)
    out = unperm(jnp.concatenate(
        [rad, rec.hit[..., None].astype(jnp.float32)], axis=-1))
    return out[:, 0:3], out[:, 3] > 0.5


def _trace_shade_bucketed_fused(trace_fused, shade_fn, env, o, d, t_min,
                                t_max, ray_order, bucket: int,
                                miss_lod=0.0, miss_all=None):
    """Bucketed secondary wave: every per-lane cost except the sort and
    the miss-env lookup becomes BUCKET-proportional instead of
    R-proportional.

    The morton/octant sort compacts dead rays last, so the live wave is
    a PREFIX of the sorted order; when it fits a static `bucket`-row
    prefix, trace + hit shading + the permutation run on that prefix
    only (gathers cost ~6 ns/row, so a 921k-row permute is ~5.6 ms while
    a 128k-row one is ~0.8 ms — scripts/sortbench.py; at 4K the full-R
    permutes alone were ~300 ms).  Dead lanes only ever contribute the
    miss radiance, computed for everyone in ROW-MAJOR order (no permute)
    and overwritten for bucket lanes by a bucket-row scatter.  A runtime
    lax.cond falls back to the full sorted path when the live count
    exceeds the bucket, preserving exact semantics for any scene.

    ray_order must be (order, inverse) arrays (a data-dependent sort)."""
    import jax

    order, inv = ray_order
    R = o.shape[0]
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    # Row-major miss radiance.  Only DEAD lanes ever read it (live lanes
    # are overwritten by the bucket scatter), and the only dead lanes
    # whose radiance survives downstream are sky pixels, where
    # trace_dir == the primary ray_d bitwise.  When the env probe has a
    # packed-quad table and the miss LOD is 0 (the reference semantics,
    # missMain RayTracing.hlsl:619-625), the miss lookup FUSES into the
    # bucket un-permute: one combined R-row gather over
    # [bucket results | env quad rows] replaces the two separate R-row
    # gathers (~4 ms @720p — gathers cost ~6 ns/row, width-free).
    fuse_miss = (env.quad is not None
                 and isinstance(miss_lod, (int, float))
                 and float(miss_lod) == 0.0)
    env_all = None
    if not fuse_miss:
        env_all = (miss_all if miss_all is not None
                   else sample_env(env, d, miss_lod))
    live = jnp.sum((tm > 0.0).astype(jnp.int32))

    def bucket_path(_):
        idx = order[:bucket]                          # static slice
        bundle = jax.lax.optimization_barrier(
            jnp.concatenate([o, d, tm[:, None]], axis=-1)[idx])
        o_k, d_k = bundle[:, 0:3], bundle[:, 3:6]
        rec, nrm = trace_fused(o_k, d_k, t_min, bundle[:, 6])
        shaded, env_tap = shade_fn(rec, nrm, o_k, d_k)
        env_k = (env_tap if env_tap is not None
                 else sample_env(env, d_k, miss_lod))
        rad_k = jnp.where(rec.hit[..., None], shaded, env_k)
        # back to row-major WITHOUT a scatter (scatters cost ~3x a
        # gather per row — round-3 trace: the .at[idx].set form was
        # 14 ms/frame): invert the permutation with a second argsort
        # (~1.2 ms) and fetch each row's bucket result with one gather,
        # falling back to the miss radiance outside the bucket
        inv_p = jnp.argsort(order)
        in_b = inv_p < bucket
        if fuse_miss:
            # combined table: rows [0, bucket) = this wave's results
            # [rad.xyz hit 0*8], rows [bucket, ...) = env quad texels.
            # Rows outside the bucket gather their miss footprint and
            # bilinear-mix it; bucket rows force weights (1,0,0,0) so the
            # same mix returns rad verbatim (col 3 = hit flag rides the
            # zero-weight c10 slot).
            from .env import dir_to_face_uv
            brow = jnp.concatenate(
                [rad_k, rec.hit[..., None].astype(jnp.float32),
                 jnp.zeros((bucket, 8), jnp.float32)], axis=-1)
            tbl = jnp.concatenate([brow, env.quad], axis=0)
            face, uu, vv = dir_to_face_uv(d)
            s = env.sizes[0]
            sf = s.astype(jnp.float32)
            x = jnp.clip(uu * sf - 0.5, 0.0, sf - 1.0)
            y = jnp.clip(vv * sf - 0.5, 0.0, sf - 1.0)
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            eidx = (env.offsets[0]
                    + (face * s + y0.astype(jnp.int32)) * s
                    + x0.astype(jnp.int32))
            gidx = jnp.where(in_b, jnp.minimum(inv_p, bucket - 1),
                             bucket + eidx)
            q = jax.lax.optimization_barrier(tbl[gidx])
            fx = jnp.where(in_b, 0.0, x - x0)[..., None]
            fy = jnp.where(in_b, 0.0, y - y0)[..., None]
            rad = (q[:, 0:3] * (1 - fx) * (1 - fy)
                   + q[:, 3:6] * fx * (1 - fy)
                   + q[:, 6:9] * (1 - fx) * fy
                   + q[:, 9:12] * fx * fy)
            hit = in_b & (q[:, 3] > 0.5)
            return rad, hit
        back = jnp.concatenate(
            [rad_k, rec.hit[..., None].astype(jnp.float32)], axis=-1
        )[jnp.minimum(inv_p, bucket - 1)]
        rad = jnp.where(in_b[..., None], back[:, 0:3], env_all)
        hit = in_b & (back[:, 3] > 0.5)
        return rad, hit

    def full_path(_):
        return _trace_shade_ordered_fused(
            trace_fused, shade_fn, env, o, d, t_min, t_max,
            (order, inv), miss_lod=miss_lod)

    # NOTE a smaller-tier ladder was priced and REVERTED: at 720p the
    # live reflection wave is ~175-177k rays (~19% of R — the NoL cull
    # kills almost nothing at rough 0.5), which straddled any half-size
    # tier bound, and the extra switch branch alone cost ~14 ms/frame
    # (83.5 vs 69.8 ms bench) — docs/PERF.md r3.
    from jax import lax
    return lax.cond(live <= bucket, bucket_path, full_path, None)


def world_to_object(consts: FrameConstants, inst, num_i: int,
                    p_world=None, n_world=None):
    """Recover object-space position/normal from world-space hit data via
    per-instance inverse transforms (one-hot matmuls) — the fused kernel
    returns world-space attributes, but getUV / velocity want object space
    (RayTracing.hlsl:236-244, 308-311)."""
    pos_obj = nrm_obj = None
    if p_world is not None:
        iw = take_small(consts.inv_worlds, inst, num_i)
        pos_obj = (jnp.einsum("...c,...cd->...d", p_world, iw[..., :3, :3])
                   + iw[..., 3, :3])
    if n_world is not None:
        w3 = take_small(consts.worlds, inst, num_i)[..., :3, :3]
        # n_obj = n_world @ A^T  (inverse of n_world = n_obj @ A^-T)
        nrm_obj = jnp.einsum("...d,...cd->...c", n_world, w3)
    return pos_obj, nrm_obj


def calc_barycentrics(p, ndc):
    """calcBarycentrics (RayTracing.hlsl:204-225): perspective-correct
    barycentrics from clip-space triangle p (R, 3, 4) and pixel NDC (R, 2)."""
    inv_w = 1.0 / p[..., 3]                       # (R, 3)
    ndc_v = p[..., :2] * inv_w[..., None]         # (R, 3, 2)
    d21 = ndc_v[..., 2, :] - ndc_v[..., 1, :]
    d01 = ndc_v[..., 0, :] - ndc_v[..., 1, :]
    inv_det = 1.0 / (d21[..., 0] * d01[..., 1] - d21[..., 1] * d01[..., 0])
    dpdx = jnp.stack([ndc_v[..., 1, 1] - ndc_v[..., 2, 1],
                      ndc_v[..., 2, 1] - ndc_v[..., 0, 1],
                      ndc_v[..., 0, 1] - ndc_v[..., 1, 1]],
                     axis=-1) * inv_det[..., None]
    dpdy = jnp.stack([ndc_v[..., 2, 0] - ndc_v[..., 1, 0],
                      ndc_v[..., 0, 0] - ndc_v[..., 2, 0],
                      ndc_v[..., 1, 0] - ndc_v[..., 0, 0]],
                     axis=-1) * inv_det[..., None]
    delta = ndc - ndc_v[..., 0, :]
    interp_inv_w = (inv_w[..., 0]
                    + delta[..., 0] * jnp.sum(inv_w * dpdx, axis=-1)
                    + delta[..., 1] * jnp.sum(inv_w * dpdy, axis=-1))
    interp_w = 1.0 / interp_inv_w
    bx = interp_w * (delta[..., 0] * dpdx[..., 1] * inv_w[..., 1]
                     + delta[..., 1] * dpdy[..., 1] * inv_w[..., 1])
    by = interp_w * (delta[..., 0] * dpdx[..., 2] * inv_w[..., 2]
                     + delta[..., 1] * dpdy[..., 2] * inv_w[..., 2])
    return bx, by


def _mip_level(env: EnvMap, rough):
    """calcCubemapMipFromRoughness (RayTracing.hlsl:416-422)."""
    level = 3.0 - 1.15 * jnp.log2(jnp.maximum(rough, 1e-20))
    return env.num_mips - 1.0 - level


def _spec_env_shade(env: EnvMap, n, v, rough, color, metal,
                    dbg_mode="full", miss_dir=None, hit=None,
                    miss_lod=0.0):
    """computeReflection at the recursion limit (RayTracing.hlsl:442-481,
    depth >= MAX branch): H = N, direction faded toward N by roughness,
    mip-filtered env lookup, EnvBRDFApprox split-sum weight.

    miss_dir/hit: when given, the env tap serves DOUBLE DUTY — hit lanes
    sample the roughness-filtered spec direction, miss lanes sample
    (miss_dir, miss_lod) — so the wave's miss radiance costs zero extra
    gathers (missMain RayTracing.hlsl:619-625 semantics; level selection
    per lane, values identical to a separate lookup).  Returns
    (spec, env_tap) then; plain spec otherwise.

    dbg_mode (profiling ablation only): "no_env" replaces the env lookup
    with a constant; "bilinear" samples the floor mip only."""
    a = rough * rough
    r = reflect(-v, n)
    k = ((1.0 - a) * (jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) + a))[..., None]
    d = n + (r - n) * k                      # lerp(N, R, k), unnormalized
    nol = jnp.sum(n * d, axis=-1)
    nov = saturate(jnp.sum(n * v, axis=-1))
    env_tap = None
    if dbg_mode == "no_env":
        rad = jnp.full_like(d, 0.5)
    elif dbg_mode == "bilinear":
        from .env import dir_to_face_uv, _bilinear
        lvl = jnp.clip(_mip_level(env, rough), 0.0, env.num_mips - 1.0)
        face, uu, vv = dir_to_face_uv(d)
        rad = _bilinear(env, jnp.floor(lvl).astype(jnp.int32), face, uu,
                        vv)
    elif miss_dir is not None:
        tap_d = jnp.where(hit[..., None], d, miss_dir)
        tap_l = jnp.where(hit, _mip_level(env, rough),
                          jnp.float32(miss_lod))
        env_tap = sample_env(env, tap_d, tap_l)
        rad = env_tap
    else:
        rad = sample_env(env, d, _mip_level(env, rough))
    rad = jnp.where((nol > 0.0)[..., None], rad, 0.0)
    f0 = 0.04 * (1.0 - metal[..., None]) + color * metal[..., None]
    spec = rad * env_brdf_approx(f0, rough, nov)
    if miss_dir is not None:
        return spec, env_tap
    return spec


def _sh_shade(sh_coeffs, n, albedo):
    """computeDiffuse at the recursion limit (RayTracing.hlsl:513):
    SH irradiance / pi, modulated by albedo."""
    return evaluate_sh_irradiance(sh_coeffs, n) / PI * albedo


def _shade_secondary(geom, mesh_ids, consts, mats, env, sh_coeffs,
                     rec, ray_dir, damp_diffuse_albedo,
                     fused_n=None, ray_o=None, dbg_env_mode="full",
                     miss_dir=None, miss_lod=0.0):
    """Shared closest-hit shading for depth-1 rays.

    Both hit shaders route by the hit material's metallic
    (closestHitReflection:588-589, closestHitDiffuse:605-612):
    metallic > 0.5 -> env-specular path, else -> SH-diffuse path.
    closestHitDiffuse additionally damps albedo by (1 - metallic) on the
    diffuse route (:607) — `damp_diffuse_albedo`.

    fused_n/ray_o: when the traversal kernel returned interpolated world
    normals (ops/fused.py), the hit point is ray_o + t*dir and object-space
    attributes come from inverse instance transforms — no vertex gather.
    """
    if fused_n is not None:
        # fused_n is the OBJECT-space interpolated normal
        p_world = ray_o + rec.t[..., None] * ray_dir
        pos_obj, _ = world_to_object(consts, rec.inst, len(mesh_ids),
                                     p_world, None)
        nrm_obj = fused_n
        n = _normalize(jnp.einsum(
            "...c,...cd->...d", fused_n,
            take_small(consts.world_its, rec.inst, len(mesh_ids))))
    else:
        pos_obj, nrm_obj = interp_attribs(geom, mesh_ids, rec.inst,
                                          rec.prim, rec.u, rec.v)
        wit = take_small(consts.world_its, rec.inst,
                         len(mesh_ids))                      # (R, 3, 3)
        n = _normalize(jnp.einsum("...c,...cd->...d", nrm_obj, wit))
    v = -ray_dir
    uv = get_uv(nrm_obj, pos_obj)
    rough, metal = get_rough_metal(mats.rough_metals, rec.inst, uv)
    color = get_base_color(mats.base_colors, rec.inst)[..., :3]

    env_tap = None
    if miss_dir is not None and dbg_env_mode == "full":
        spec, env_tap = _spec_env_shade(env, n, v, rough, color, metal,
                                        miss_dir=miss_dir, hit=rec.hit,
                                        miss_lod=miss_lod)
    else:
        spec = _spec_env_shade(env, n, v, rough, color, metal,
                               dbg_mode=dbg_env_mode)
    albedo = jnp.where(damp_diffuse_albedo,
                       color * (1.0 - metal[..., None]), color)
    diff = _sh_shade(sh_coeffs, n, albedo)
    shaded = jnp.where((metal > 0.5)[..., None], spec, diff)
    if miss_dir is not None:
        return shaded, env_tap
    return shaded


def primary_surface(geom: SceneGeometry, tlas, consts: FrameConstants,
                    mats: MaterialsDev, width: int, height: int,
                    bary_mode: str = "direct", row0=0, band_height=None,
                    trace_fn=None, ray_order=None, trace_fused=None):
    """Primary cast replacing the visibility raster + getPrimarySurface
    (RayTracing.hlsl:277-333).  Returns a dict of flat (R,) / (R, C) arrays.

    row0/band_height: render only image rows [row0, row0+band_height) of
    the full width x height viewport — the image-space sharding hook
    (row0 may be traced, e.g. an axis_index-derived offset in shard_map).
    """
    if band_height is None:
        band_height = height
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    rows = row0 + jnp.arange(band_height, dtype=jnp.float32)
    ys = -((rows + 0.5) / height * 2.0 - 1.0)
    sx, sy = jnp.meshgrid(xs, ys, indexing="xy")
    ndc = jnp.stack([sx.reshape(-1), sy.reshape(-1)], axis=-1)  # (R, 2)
    ndc = ndc - consts.proj_bias                                 # :300

    # unproject onto the near plane (z_ndc = 0), cast from there so the
    # near-clip behavior matches the raster pass
    ndc_h = jnp.concatenate(
        [ndc, jnp.zeros_like(ndc[..., :1]), jnp.ones_like(ndc[..., :1])],
        axis=-1)
    world = ndc_h @ consts.proj_to_world
    p_near = world[..., :3] / world[..., 3:4]
    ray_d = _normalize(p_near - consts.eye)

    mesh_ids = tlas.mesh_ids
    num_i = len(mesh_ids)

    if trace_fused is not None and bary_mode == "direct":
        # fused kernel returns interpolated OBJECT-space normals; the hit
        # point is on-ray; object position comes from the inverse world
        rec, nrm_obj = _trace_ordered_fused(trace_fused, p_near, ray_d,
                                            0.0, T_MAX, ray_order)
        u, v = rec.u, rec.v
        p_world = p_near + rec.t[..., None] * ray_d
        pos_obj, _ = world_to_object(consts, rec.inst, num_i,
                                     p_world, None)
        n = _normalize(jnp.einsum(
            "...c,...cd->...d", nrm_obj,
            take_small(consts.world_its, rec.inst, num_i)))
    else:
        if trace_fused is not None:     # ndc barycentrics need vertices
            def trace_fn(_tlas, o, d, a, b):
                return trace_fused(o, d, a, b)[0]
        if trace_fn is None:
            trace_fn = default_tracer(geom)
        rec = _trace_ordered(trace_fn, tlas, p_near, ray_d, 0.0, T_MAX,
                             ray_order)

        vp, vn = fetch_vertices(geom, mesh_ids, rec.inst, rec.prim)
        if bary_mode == "ndc":
            wvp = take_small(consts.world_view_projs, rec.inst, num_i)
            vh = jnp.concatenate([vp, jnp.ones_like(vp[..., :1])], axis=-1)
            clip_v = jnp.einsum("...vc,...cd->...vd", vh, wvp)
            u, v = calc_barycentrics(clip_v, ndc)
        else:
            u, v = rec.u, rec.v
        pos_obj, nrm_obj = interp_from_vertices(vp, vn, u, v)

        worlds = take_small(consts.worlds, rec.inst, num_i)
        p_world = (jnp.einsum("...c,...cd->...d", pos_obj,
                              worlds[..., :3, :3]) + worlds[..., 3, :3])
        n = _normalize(jnp.einsum("...c,...cd->...d", nrm_obj,
                                  take_small(consts.world_its, rec.inst,
                                             num_i)))

    uv = get_uv(nrm_obj, pos_obj)
    rough, metal = get_rough_metal(mats.rough_metals, rec.inst, uv)
    color = get_base_color(mats.base_colors, rec.inst)[..., :3]
    # sky pixels: P = near-plane point, N = 0, V toward eye
    # (RayTracing.hlsl:319-331)
    hit3 = rec.hit[..., None]
    p_world = jnp.where(hit3, p_world, p_near)
    n = jnp.where(hit3, n, 0.0)
    v_dir = _normalize(consts.eye - p_world)

    # velocity (RayTracing.hlsl:308-311)
    pos_h = jnp.concatenate([pos_obj, jnp.ones_like(pos_obj[..., :1])],
                            axis=-1)
    prev_clip = jnp.einsum("...c,...cd->...d", pos_h,
                           take_small(consts.world_view_projs_prev,
                                      rec.inst, num_i))
    velocity = ((ndc - prev_clip[..., :2] / prev_clip[..., 3:4])
                * jnp.asarray([0.5, -0.5], jnp.float32))
    velocity = jnp.where(hit3[..., :2], velocity, 0.0)

    # raster-equivalent depth for the denoiser (z_clip / w of the hit)
    cur_clip = jnp.einsum("...c,...cd->...d", pos_h,
                          take_small(consts.world_view_projs, rec.inst,
                                     num_i))
    depth = jnp.where(rec.hit, cur_clip[..., 2] / cur_clip[..., 3], 1.0)

    # visibility encoding ((inst << PRIMITIVE_BITS) | prim) + 1
    # (PSVisibility.hlsl:18-24)
    vis = jnp.where(
        rec.hit,
        ((rec.inst.astype(jnp.uint32) << PRIMITIVE_BITS)
         | rec.prim.astype(jnp.uint32)) + jnp.uint32(1),
        jnp.uint32(0))

    metal = jnp.where(rec.hit, metal, 0.0)      # rghMtl.y = 0 for sky (:329)
    rough = jnp.where(rec.hit, rough, 0.0)

    return dict(hit=rec.hit, vis=vis, n=n, v=v_dir, p=p_world,
                color=color, rough=rough, metal=metal,
                velocity=velocity, depth=depth, ray_d=ray_d)


def ray_trace_pass(geom: SceneGeometry, tlas, consts: FrameConstants,
                   mats: MaterialsDev, env: EnvMap, sh_coeffs,
                   width: int, height: int, bary_mode: str = "direct",
                   row0=0, band_height=None, trace_fn=None, ray_order=None,
                   sort_secondary=False, trace_fused=None,
                   secondary_bucket=0.25, sort_dir_bits=3,
                   anchor_fn=None, anchor_bits=0,
                   dbg_no_refl_trace=False, dbg_no_secondary_shade=False,
                   dbg_env_mode="full", dbg_miss_lod=0.0):
    """Full DispatchRays equivalent. Returns a dict of (H, W, C) images:
    refl, diff (radiance), normal (xyz*0.5+0.5 + hit alpha), rough_metal,
    velocity, depth, vis.  row0/band_height restrict to a row band (the
    RNG stays keyed on global pixel ids, so bands tile deterministically).

    trace_fn: (tlas, o, d, t_min, t_max) -> HitRecord (default: pure-JAX
    traversal; the renderer passes the Pallas kernel).  ray_order: optional
    (order, inverse) screen-block permutation for tile coherence.
    """
    if band_height is None:
        band_height = height
    if trace_fn is None and trace_fused is None:
        trace_fn = default_tracer(geom)
    surf = primary_surface(geom, tlas, consts, mats, width, height,
                           bary_mode, row0=row0, band_height=band_height,
                           trace_fn=trace_fn, ray_order=ray_order,
                           trace_fused=trace_fused)
    hit = surf["hit"]
    n, v, p = surf["n"], surf["v"], surf["p"]
    rough, metal, color = surf["rough"], surf["metal"], surf["color"]
    mesh_ids = tlas.mesh_ids

    R = hit.shape[0]
    px = jnp.tile(jnp.arange(width, dtype=jnp.int32), band_height)
    py = jnp.repeat(row0 + jnp.arange(band_height, dtype=jnp.int32), width)
    xi = sample_param(px, py, width, consts.frame_index)

    # ---------------- reflection wave (computeReflection, depth 0) -------
    a = rough * rough
    h = ggx_dir(a, n, xi)
    r_dir = reflect(-v, h)
    nol = jnp.sum(n * r_dir, axis=-1)
    trace_dir = jnp.where(hit[..., None], r_dir, -v)  # sky: direction = -V
    # rays the reference never traced are masked out (t_max = -1): sky
    # pixels take env directly; NoL <= 0 hit pixels contribute 0 below
    tmax_r = jnp.where(hit & (nol > 0.0), T_MAX, -1.0)
    if dbg_no_refl_trace:     # ablation: kill the wave (profiling only)
        tmax_r = jnp.full_like(tmax_r, -1.0)

    def secondary_order(dirs, tmax, with_inverse=True):
        """Morton+octant sort with dead-ray compaction for bounce waves
        (kernel-tile coherence; trades an argsort for smaller node-visit
        unions)."""
        if not sort_secondary:
            return ray_order
        from ..ops.traverse_pallas import sort_rays_morton
        lo = jnp.min(tlas.aabb_min, axis=0)
        hi = jnp.max(tlas.aabb_max, axis=0)
        aid = (anchor_fn(p, dirs)
               if anchor_fn is not None and anchor_bits else None)
        return sort_rays_morton(p, dirs, lo, hi, active=tmax > 0,
                                with_inverse=with_inverse,
                                dir_bits=sort_dir_bits,
                                anchor=aid, anchor_bits=anchor_bits)

    # closestHitReflection early-out (:573): payload seeded with
    # color * metallic; all-nonpositive seed skips hit shading
    seed = color * metal[..., None]
    seed_dead = jnp.all(seed <= 0.0, axis=-1, keepdims=True)
    if trace_fused is not None:
        # trace AND shade in the sorted ray domain (env tap locality);
        # rec.hit implies the primary hit mask (tmax_r > 0 only there)
        def shade_r(rec, nrm, o_s, d_s):
            if dbg_no_secondary_shade:   # ablation (profiling only)
                return jnp.zeros_like(o_s), None
            return _shade_secondary(geom, mesh_ids, consts, mats, env,
                                    sh_coeffs, rec, d_s,
                                    damp_diffuse_albedo=False,
                                    fused_n=nrm, ray_o=o_s,
                                    dbg_env_mode=dbg_env_mode,
                                    miss_dir=d_s, miss_lod=dbg_miss_lod)

        bucket = int(secondary_bucket * R) if secondary_bucket else 0
        bucket = -(-bucket // 8192) * 8192            # whole kernel tiles
        use_bucket = sort_secondary and 0 < bucket < R
        sec_order = secondary_order(trace_dir, tmax_r,
                                    with_inverse=not use_bucket)
        if use_bucket:
            # one shared row-major miss lookup: sky lanes (the only dead
            # lanes whose radiance survives) have trace_dir == ray_d.
            # With a quad-packed env at LOD 0 the miss lookup fuses into
            # the bucket un-permute instead (see
            # _trace_shade_bucketed_fused) — don't materialize it here
            # (a lax.cond operand is computed even when the live-diffuse
            # branch never runs).
            miss_all = None
            if not (env.quad is not None and float(dbg_miss_lod) == 0.0):
                miss_all = sample_env(env, surf["ray_d"], dbg_miss_lod)
            radiance_r, hit_r = _trace_shade_bucketed_fused(
                trace_fused, shade_r, env, p, trace_dir,
                T_MIN_SECONDARY, tmax_r, sec_order, bucket,
                miss_lod=dbg_miss_lod, miss_all=miss_all)
        else:
            radiance_r, hit_r = _trace_shade_ordered_fused(
                trace_fused, shade_r, env, p, trace_dir,
                T_MIN_SECONDARY, tmax_r, sec_order,
                miss_lod=dbg_miss_lod)
        radiance_r = jnp.where(seed_dead & hit_r[..., None], seed,
                               radiance_r)
    else:
        rec_r = _trace_ordered(trace_fn, tlas, p, trace_dir,
                               T_MIN_SECONDARY, tmax_r,
                               secondary_order(trace_dir, tmax_r))
        shaded_r = _shade_secondary(geom, mesh_ids, consts, mats, env,
                                    sh_coeffs, rec_r, trace_dir,
                                    damp_diffuse_albedo=False)
        shaded_r = jnp.where(seed_dead, seed, shaded_r)
        env_r = sample_env(env, trace_dir, dbg_miss_lod)
        radiance_r = jnp.where(rec_r.hit[..., None] & hit[..., None],
                               shaded_r, env_r)

    # primary BRDF weight (RayTracing.hlsl:461-478)
    f0 = 0.04 * (1.0 - metal[..., None]) + color * metal[..., None]
    voh = saturate(jnp.sum(v * h, axis=-1))
    noh = saturate(jnp.sum(n * h, axis=-1))
    nov = saturate(jnp.sum(n * v, axis=-1))
    fres = f_schlick(f0, voh)
    vis_t = vis_smith(rough, nov, nol)
    weight = (nol * vis_t * (4.0 * voh / noh))[..., None] * fres
    refl = jnp.where(hit[..., None],
                     jnp.where((nol > 0.0)[..., None],
                               radiance_r * weight, 0.0),
                     radiance_r)

    # ---------------- diffuse wave (computeDiffuse, depth 0) -------------
    # The default materials are fully metallic (metallic = 1 masks every
    # diffuse ray, raygenMain:559); running the trace + hit shading + env
    # lookup for an all-dead wave costs ~80 ms/frame @720p for nothing.
    # A runtime lax.cond keeps exact semantics for any material set while
    # the all-metal case pays only the cheap composite: where no diffuse
    # ray is live, every HIT pixel's diff is masked to 0 downstream, and
    # every SKY pixel's diff equals env(-V) — which the reflection wave
    # already sampled (trace_dir == -V for sky).
    d_dir = cos_dir(n, xi)
    trace_dir_d = jnp.where(hit[..., None], d_dir, -v)
    tmax_d = jnp.where(hit & (metal < 1.0), T_MAX, -1.0)

    def live_diffuse(_):
        if trace_fused is not None:
            def shade_d(rec, nrm, o_s, d_s):
                return _shade_secondary(geom, mesh_ids, consts, mats,
                                        env, sh_coeffs, rec, d_s,
                                        damp_diffuse_albedo=True,
                                        fused_n=nrm, ray_o=o_s,
                                        miss_dir=d_s)

            d_order = secondary_order(trace_dir_d, tmax_d,
                                      with_inverse=not use_bucket)
            if use_bucket:
                radiance_d, _hd = _trace_shade_bucketed_fused(
                    trace_fused, shade_d, env, p, trace_dir_d,
                    T_MIN_SECONDARY, tmax_d, d_order, bucket,
                    miss_all=miss_all)
            else:
                radiance_d, _hd = _trace_shade_ordered_fused(
                    trace_fused, shade_d, env, p, trace_dir_d,
                    T_MIN_SECONDARY, tmax_d, d_order)
        else:
            rec_d = _trace_ordered(trace_fn, tlas, p, trace_dir_d,
                                   T_MIN_SECONDARY, tmax_d,
                                   secondary_order(trace_dir_d, tmax_d))
            shaded_d = _shade_secondary(geom, mesh_ids, consts, mats, env,
                                        sh_coeffs, rec_d, trace_dir_d,
                                        damp_diffuse_albedo=True)
            env_d = sample_env(env, trace_dir_d, 0.0)
            radiance_d = jnp.where(rec_d.hit[..., None] & hit[..., None],
                                   shaded_d, env_d)
        # primary albedo weight: albedo * (1 - 0.04) at depth 0 (:532)
        return jnp.where(hit[..., None],
                         radiance_d * color * (1.0 - 0.04), radiance_d)

    def dead_diffuse(_):
        # sky pixels: diff = env(-V), which the reflection wave already
        # produced (trace_dir == -V there and it cannot hit)
        sky_env = (radiance_r if trace_fused is not None else env_r)
        return jnp.where(hit[..., None], 0.0, sky_env)

    if trace_fused is not None:
        # runtime-gated: the all-metallic default scene skips the whole
        # wave.  Only on the fused path — wrapping the pure-JAX traversal
        # in a cond explodes CPU compile time for no runtime win there.
        from jax import lax
        diff = lax.cond(jnp.any(tmax_d > 0.0), live_diffuse, dead_diffuse,
                        None)
    else:
        diff = live_diffuse(None)
    # metallic >= 1 pixels never get a diffuse ray (raygenMain:559)
    diff = jnp.where((metal < 1.0)[..., None], diff, 0.0)

    hw = (band_height, width)
    return dict(
        refl=refl.reshape(hw + (3,)),
        diff=diff.reshape(hw + (3,)),
        normal=jnp.concatenate(
            [n * 0.5 + 0.5, hit[..., None].astype(jnp.float32)],
            axis=-1).reshape(hw + (4,)),
        rough_metal=jnp.stack([rough, metal], axis=-1).reshape(hw + (2,)),
        velocity=surf["velocity"].reshape(hw + (2,)),
        depth=surf["depth"].reshape(hw),
        vis=surf["vis"].reshape(hw),
    )
