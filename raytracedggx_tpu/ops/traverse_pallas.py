"""Pallas TPU packet traversal — the hot kernel of the renderer.

One grid step owns a tile of 1024 rays held in (8, 128) vector registers;
the whole BVH (nodes, skip links, triangle stream — flatten.py) resides in
VMEM.  The tile walks the tree in DFS order:

  per step: one scalar node fetch, broadcast AABB slab test against all
  1024 rays (pure VPU), a tile-wide any() reduction decides descend vs
  skip; leaf nodes stream their triangles through a broadcast
  Möller–Trumbore test with masked best-hit updates.

No gathers, no per-ray stacks: the only data-dependent control is the
scalar node pointer — exactly the control structure TPUs can run fast.
Cost per tile is the union of nodes its rays visit, so callers should
sort incoherent ray batches (sort_rays_morton) before tracing.

This kernel is the native replacement for both the driver BVH traversal
behind DXR DispatchRays (XUSGRayTracing.h:306-341) and its compute-shader
fallback (Common/D3D12RaytracingFallback.h).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..trace.traverse import HitRecord
from .flatten import FlatBVH

TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L


def _traverse_kernel(nodes_ref, tris_ref, rays_ref,
                     t_ref, u_ref, v_ref, prim_ref, *,
                     num_nodes, t_min, fetch="onehot"):
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmax0 = rays_ref[0, 6]   # per-ray: -1 masks a ray out entirely

    eps = jnp.float32(1e-20)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d >= 0, eps, -eps), d)

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    def fetch_column(ref, idx):
        """Extract column idx%128 of tile idx//128 as a (rows,) vector.
        'onehot': masked lane reduction (portable). 'roll': dynamic lane
        rotate + static slice (cheaper when Mosaic supports it)."""
        tile = ref[idx >> 7]
        lane = idx & 127
        if fetch == "roll":
            rolled = pltpu.roll(tile, shift=-lane, axis=1)
            return rolled[:, 0]
        rows = tile.shape[0]
        lanes = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        return jnp.sum(jnp.where(lanes == lane, tile, 0.0), axis=1)

    # ---- tile frustum (scalar bounds over the LIVE rays) -----------------
    # Dead rays (t_max < 0) are excluded so they don't widen the bundle.
    live = tmax0 >= 0.0
    big = jnp.float32(3e38)

    def mn(v):
        return jnp.min(jnp.where(live, v, big))

    def mx(v):
        return jnp.max(jnp.where(live, v, -big))

    ob = ((mn(ox), mx(ox)), (mn(oy), mx(oy)), (mn(oz), mx(oz)))
    ib = ((mn(ix), mx(ix)), (mn(iy), mx(iy)), (mn(iz), mx(iz)))
    t_cap = mx(tmax0)

    def interval_slab(lo, hi, o_b, i_b):
        """Conservative per-axis [entry_min, exit_max] over the bundle."""
        a0, a1 = lo - o_b[1], lo - o_b[0]     # lo - o interval
        b0, b1 = hi - o_b[1], hi - o_b[0]
        i0, i1 = i_b
        # products of intervals (scalars; 8 muls)
        p = (a0 * i0, a0 * i1, a1 * i0, a1 * i1)
        q = (b0 * i0, b0 * i1, b1 * i0, b1 * i1)
        lo_t = jnp.minimum(jnp.minimum(p[0], p[1]), jnp.minimum(p[2], p[3]))
        lo_u = jnp.minimum(jnp.minimum(q[0], q[1]), jnp.minimum(q[2], q[3]))
        hi_t = jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3]))
        hi_u = jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
        entry_min = jnp.minimum(lo_t, lo_u)   # min over rays of slab entry
        exit_max = jnp.maximum(hi_t, hi_u)    # max over rays of slab exit
        return entry_min, exit_max

    def body(carry):
        i, bt, bu, bv, bp = carry
        # fetch node i (links ride the same f32 tile, exact for < 2^24)
        col = fetch_column(nodes_ref, i)               # (9,)
        skip = col[6].astype(jnp.int32)
        tstart = col[7].astype(jnp.int32)
        tcount = col[8].astype(jnp.int32)

        # scalar frustum pre-test: if the whole bundle's conservative
        # interval misses this AABB, skip without touching the VPU
        ex, xx = interval_slab(col[0], col[3], ob[0], ib[0])
        ey, xy = interval_slab(col[1], col[4], ob[1], ib[1])
        ez, xz = interval_slab(col[2], col[5], ob[2], ib[2])
        f_near = jnp.maximum(jnp.maximum(ex, ey), ez)
        f_far = jnp.minimum(jnp.minimum(xx, xy), xz)
        maybe = (f_near <= f_far) & (f_far >= t_min) & (f_near <= t_cap)

        def full_test(_):
            t0x = (col[0] - ox) * ix
            t1x = (col[3] - ox) * ix
            t0y = (col[1] - oy) * iy
            t1y = (col[4] - oy) * iy
            t0z = (col[2] - oz) * iz
            t1z = (col[5] - oz) * iz
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                            jnp.minimum(t0y, t1y)),
                                jnp.minimum(t0z, t1z))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            hit = (tnear <= tfar) & (tfar >= t_min) & (tnear <= bt)
            return hit, jnp.any(hit)

        hit, anyhit = lax.cond(
            maybe, full_test,
            lambda _: (jnp.zeros((TILE_S, TILE_L), jnp.bool_),
                       jnp.bool_(False)),   # literal False lowers as i32 and
            None)                           # trips Mosaic's scf.if verifier
        is_leaf = tcount > 0

        def leaf(args):
            bt, bu, bv, bp = args

            def tri_step(k, c):
                bt, bu, bv, bp = c
                ti = tstart + k
                tr = fetch_column(tris_ref, ti)          # (9,)
                v0x, v0y, v0z = tr[0], tr[1], tr[2]
                e1x, e1y, e1z = tr[3], tr[4], tr[5]
                e2x, e2y, e2z = tr[6], tr[7], tr[8]
                # Moller-Trumbore, broadcast over the tile
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = 1.0 / det
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t >= t_min) & (t <= bt))
                return (jnp.where(ok, t, bt),
                        jnp.where(ok, u, bu),
                        jnp.where(ok, v, bv),
                        jnp.where(ok, ti, bp))

            return lax.fori_loop(0, tcount, tri_step, (bt, bu, bv, bp))

        bt, bu, bv, bp = lax.cond(is_leaf & anyhit, leaf,
                                  lambda a: a, (bt, bu, bv, bp))
        i_next = jnp.where(anyhit & jnp.logical_not(is_leaf), i + 1, skip)
        return i_next, bt, bu, bv, bp

    def cond(carry):
        return carry[0] < num_nodes

    init = (jnp.int32(0),
            tmax0,
            jnp.zeros((TILE_S, TILE_L), jnp.float32),
            jnp.zeros((TILE_S, TILE_L), jnp.float32),
            jnp.full((TILE_S, TILE_L), -1, jnp.int32))
    _, bt, bu, bv, bp = lax.while_loop(cond, body, init)

    t_ref[0] = bt
    u_ref[0] = bu
    v_ref[0] = bv
    prim_ref[0] = bp


def trace_rays_pallas(flat: FlatBVH, ray_o, ray_d, t_min, t_max,
                      interpret: bool = False,
                      fetch: str = "onehot") -> HitRecord:
    """Closest-hit trace of (R, 3) rays against one FlatBVH.

    t_max: scalar or per-ray (R,).  A per-ray t_max of -1 masks the ray
    out completely (zero traversal cost beyond tile participation) —
    used for sky pixels / killed rays / already-closer other-instance
    hits."""
    R = ray_o.shape[0]
    G = max(1, -(-R // TILE))
    pad = G * TILE - R

    def to_tiles(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return x.reshape(G, TILE_S, TILE_L, 3).transpose(0, 3, 1, 2)

    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    # padded rays get t_max = -1 (masked out)
    tmax_t = jnp.pad(tmax_arr, (0, pad), constant_values=-1.0)
    tmax_t = tmax_t.reshape(G, 1, TILE_S, TILE_L)

    rays = jnp.concatenate([to_tiles(ray_o), to_tiles(ray_d), tmax_t],
                           axis=1)
    # (G, 7, TILE_S, TILE_L)

    kernel = functools.partial(_traverse_kernel,
                               num_nodes=flat.num_nodes,
                               t_min=float(t_min), fetch=fetch)
    out_shape = [
        jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((G, TILE_S, TILE_L), jnp.int32),
    ]
    tile_spec = lambda: pl.BlockSpec((1, TILE_S, TILE_L),
                                     lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    t, u, v, prim = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
            pl.BlockSpec((1, 7, TILE_S, TILE_L),
                         lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec(), tile_spec(), tile_spec(), tile_spec()],
        out_shape=out_shape,
        interpret=interpret,
    )(flat.nodes, flat.tris, rays)

    def flat_rays(x):
        return x.reshape(G * TILE)[:R]

    t = flat_rays(t)
    u = flat_rays(u)
    v = flat_rays(v)
    pstream = flat_rays(prim)
    hit = pstream >= 0
    prim_orig = jnp.where(hit, flat.tri_perm[jnp.clip(pstream, 0, None)], -1)
    return HitRecord(t=t, prim=prim_orig.astype(jnp.int32), u=u, v=v,
                     hit=hit,
                     inst=jnp.where(hit, 0, -1).astype(jnp.int32))


def block_order(width: int, height: int, block_w: int = 32,
                block_h: int = 32):
    """Permutation mapping row-major pixel order -> 2D-block order, so a
    1024-ray kernel tile covers a compact 32x32 screen block instead of a
    1280-pixel row strip (orders of magnitude tighter node-visit unions
    for primary/reflection waves).  Returns (order, inverse) as numpy."""
    import numpy as np

    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    by = ys // block_h
    bx = xs // block_w
    key = (((by * ((width + block_w - 1) // block_w) + bx)
            * block_h + (ys % block_h)) * block_w + (xs % block_w))
    order = np.argsort(key.ravel(), kind="stable").astype(np.int32)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order), dtype=np.int32)
    return order, inv


class BlockOrder:
    """Reshape-based screen-block ordering: equivalent to the
    (order, inverse) permutation arrays from block_order, but applied as
    reshape+transpose — a streaming HBM copy — instead of a row gather.
    TPU gathers cost ~6 ns/row regardless of width (scripts/envbench.py),
    so the two static permutes around every traversal launch cost
    ~11 ms/frame @720p as gathers and ~0.5 ms as transposes.

    Requires block_h | height and block_w | width; the renderer falls
    back to gather arrays otherwise (e.g. sharded row bands)."""

    def __init__(self, width: int, height: int, block_w: int = 64,
                 block_h: int = 16):
        assert width % block_w == 0 and height % block_h == 0
        self.width, self.height = width, height
        self.bw, self.bh = block_w, block_h

    def permute(self, x):
        """(R, C) row-major -> block order."""
        c = x.shape[-1]
        h, w, bh, bw = self.height, self.width, self.bh, self.bw
        x = x.reshape(h // bh, bh, w // bw, bw, c)
        return x.transpose(0, 2, 1, 3, 4).reshape(h * w, c)

    def unpermute(self, x):
        """(R, C) block order -> row-major."""
        c = x.shape[-1]
        h, w, bh, bw = self.height, self.width, self.bh, self.bw
        x = x.reshape(h // bh, w // bw, bh, bw, c)
        return x.transpose(0, 2, 1, 3, 4).reshape(h * w, c)


def make_block_order(width: int, height: int):
    """BlockOrder when an aligned tiling exists (64x16 and 32x32 both give
    1024-ray tiles), else (order, inverse) gather arrays."""
    for bw, bh in ((64, 16), (32, 32), (128, 8)):
        if width % bw == 0 and height % bh == 0:
            return BlockOrder(width, height, bw, bh)
    return block_order(width, height)


def sort_rays_morton(ray_o, ray_d, scene_lo, scene_hi, active=None,
                     block: int | None = None,
                     with_inverse: bool = True, dir_bits: int = 3,
                     anchor=None, anchor_bits: int = 0):
    """Sort key for incoherent secondary waves: dead rays last (so they
    compact into tiles that terminate after the root test), then direction
    octant (3 bits), then Morton of the origin — groups live rays into
    coherent kernel tiles.  Returns (order, inverse_order).

    block: sort within fixed-size ray blocks instead of globally.  The
    global bitonic argsort is O(log^2 N) passes over the whole wave
    (~529 key passes at 4K) and was the round-2 super-linear-scaling
    suspect; rays arrive in screen-block order, so a per-block sort
    (vmapped bitonic over `block` rays, log^2(block) passes) keeps
    nearly all the tile coherence — secondary rays from one screen
    region already share origins — at a fraction of the sort cost."""
    from ..bvh.morton import morton3d

    octant = ((ray_d[:, 0] >= 0).astype(jnp.uint32)
              | ((ray_d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((ray_d[:, 2] >= 0).astype(jnp.uint32) << 2))
    if dir_bits == 6:
        # 64 direction classes: signs + axis-magnitude ordering (~30 deg
        # cones) — finer direction coherence per tile at the price of
        # wider origin spread (A/B knob; 3 is the measured default)
        ax, ay, az = (jnp.abs(ray_d[:, 0]), jnp.abs(ray_d[:, 1]),
                      jnp.abs(ray_d[:, 2]))
        octant = (octant
                  | ((ax > az).astype(jnp.uint32) << 3)
                  | ((ay > az).astype(jnp.uint32) << 4)
                  | ((ax > ay).astype(jnp.uint32) << 5))
    code = morton3d(ray_o, scene_lo, scene_hi)
    # single 32-bit key (no x64): 1 dead bit + [anchor] + dir class +
    # Morton prefix (morton3d emits 30 bits; the anchor — each ray's
    # nearest-entry BVH-cut id, ops/scene_wide.anchor_ids_scene — leads
    # so tiles group by the subtree the rays DESCEND, not just where
    # they start: -19% on the reflection kernel, scripts/anchorbench.py)
    if anchor is not None and anchor_bits:
        # octant leads, anchor second: direction coherence stays primary
        # (env/shading gather locality), subtree grouping second
        ab = anchor_bits
        key = (octant << jnp.uint32(31 - dir_bits)) \
            | (anchor << jnp.uint32(31 - dir_bits - ab)) \
            | (code >> jnp.uint32(dir_bits - 1 + ab))
    else:
        key = (octant << jnp.uint32(31 - dir_bits)) \
            | (code >> jnp.uint32(dir_bits - 1))
    if active is not None:
        key = jnp.where(active, key, key | jnp.uint32(1 << 31))
    R = key.shape[0]
    if block is not None and R > block:
        pad = (-R) % block
        kp = jnp.pad(key, (0, pad),
                     constant_values=np.uint32(0xFFFFFFFF))
        local = jnp.argsort(kp.reshape(-1, block), axis=1)
        base = (jnp.arange(kp.shape[0] // block, dtype=local.dtype)
                [:, None] * block)
        order = (local + base).reshape(-1)
        if pad:
            # pad keys are the max value and argsort is stable, so the pad
            # indices land exactly in the final `pad` slots — a static slice
            order = order[:R]
    else:
        order = jnp.argsort(key)
    if not with_inverse:
        # bucketed consumers only need the inverse on the overflow
        # fallback — they build it lazily there (raygen._order_fns)
        return order, None
    # argsort of a permutation IS its inverse; the bitonic sort
    # (~1.2 ms @720p) beats the scatter form (~4 ms on TPU)
    return order, jnp.argsort(order)


def trace_scene_pallas(flats, tlas, ray_o, ray_d, t_min, t_max,
                       interpret: bool = False,
                       sort: bool = False, scene_bounds=None) -> HitRecord:
    """Closest hit across TLAS instances using the Pallas kernel.
    Mirrors trace/traverse.py:trace_scene; optionally sorts the rays for
    coherence and scatters results back."""
    if sort:
        lo, hi = scene_bounds
        order, inv = sort_rays_morton(ray_o, ray_d, lo, hi)
        ray_o = ray_o[order]
        ray_d = ray_d[order]

    best = None
    for i, mesh_id in enumerate(tlas.mesh_ids):
        inv_w = tlas.inv_worlds[i]
        o = ray_o @ inv_w[:3, :3] + inv_w[3, :3]
        d = ray_d @ inv_w[:3, :3]
        # later instances are pruned by the best t so far (and keep the
        # -1 masking of dead rays)
        tm = t_max if best is None else best.t
        rec = trace_rays_pallas(flats[mesh_id], o, d, t_min, tm,
                                interpret=interpret)
        rec = rec._replace(inst=jnp.where(rec.hit, i, -1).astype(jnp.int32))
        if best is None:
            best = rec
        else:
            closer = rec.hit & (rec.t < best.t)
            best = HitRecord(
                t=jnp.where(closer, rec.t, best.t),
                prim=jnp.where(closer, rec.prim, best.prim),
                u=jnp.where(closer, rec.u, best.u),
                v=jnp.where(closer, rec.v, best.v),
                hit=best.hit | rec.hit,
                inst=jnp.where(closer, rec.inst, best.inst),
            )

    if sort:
        best = HitRecord(*(x[inv] for x in best))
    return best
