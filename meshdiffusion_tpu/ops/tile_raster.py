"""Pallas TPU kernel for the rasterizer's per-tile z-min candidate test.

The hot loop of the differentiable rasterizer (render/rasterize.py
``_rasterize_tiles``): every TILE x TILE tile tests its K candidate
triangles with edge functions and keeps the nearest hit. The XLA version
(vmap over tiles + lax.scan over candidate chunks) runs ~100x off VPU
ideal at fitting scale (~350 ms per 512^2 x4-view layer).

Kernel layout (v5e-native): the (32, 32) pixel tile is flattened to 8
lane-groups of 128 pixels; each VPU op evaluates 8 CANDIDATES (sublanes)
x 128 PIXELS (lanes) at once — full (8, 128) vreg utilization, no scalar
loads (Mosaic rejects dynamic lane indexing: "index in dimension 2 must
be a multiple of 128", the round-2 blocker). Candidates stream in
64-wide superblocks along the minor grid axis with the running (z, tri)
minimum revisited in the output block; the 8-candidate slices inside a
superblock are python-unrolled, so every memory access has a static
offset.

Tie-break note: the jnp scan keeps the FIRST candidate on exact z ties;
this kernel keeps the first 8-candidate group, and the smallest triangle
id within a group. Exact z ties between different triangles only occur
for degenerate coincident geometry.

Forward-only by design: triangle selection is non-differentiable (the
rasterizer wraps it in stop_gradient and re-derives barycentrics
analytically), so no custom VJP is needed.

Replaces the CUDA rasterizer the reference uses via nvdiffrast
(nvdiffrec/lib/render/render.py:290-297).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
_CGS = 64          # candidates per superblock (one grid step)
_LANES = 128       # pixels per lane group


def _kernel(cand_ref, zfl_ref, outz_ref, outt_ref, *, tile, ntx):
    # cand_ref: (1, CGS, 16) candidate rows [ax ay az bx by bz cx cy cz tid]
    # zfl_ref/outz_ref/outt_ref: (1, n_pg, 128) — the whole tile's pixels,
    # sublane = 128-pixel lane group. One grid step processes one tile
    # against one candidate superblock with every pixel group held in
    # registers (tiny per-group blocks were DMA-latency-bound: 25 ms/layer
    # vs this shape's ~handful; measured on v5e).
    t = pl.program_id(0)
    cg = pl.program_id(1)
    n_pg = tile * tile // _LANES

    x0 = (t % ntx) * tile
    y0 = (t // ntx) * tile

    @pl.when(cg == 0)
    def _init():
        outz_ref[0] = jnp.full((n_pg, _LANES), BIG, jnp.float32)
        outt_ref[0] = jnp.full((n_pg, _LANES), -1.0, jnp.float32)

    zfl_all = zfl_ref[0]                               # (n_pg, 128)
    bz_all = outz_ref[0]
    bt_all = outt_ref[0]
    best_z = [bz_all[pg:pg + 1, :] for pg in range(n_pg)]
    best_t = [bt_all[pg:pg + 1, :] for pg in range(n_pg)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    for s in range(_CGS // 8):                         # static unroll
        g = cand_ref[0, s * 8:(s + 1) * 8, :]          # (8, 16)
        ax = g[:, 0:1]
        ay = g[:, 1:2]
        az = g[:, 2:3]
        bx = g[:, 3:4]
        by = g[:, 4:5]
        bz = g[:, 5:6]
        cx = g[:, 6:7]
        cy = g[:, 7:8]
        cz = g[:, 8:9]
        tid = g[:, 9:10]                               # float tri ids, -1 pad

        e_ba_x = bx - ax
        e_ba_y = by - ay
        area = e_ba_x * (cy - ay) - e_ba_y * (cx - ax)
        ok_area = jnp.abs(area) > 1e-12
        inv_area = 1.0 / jnp.where(ok_area, area, 1.0)
        live = ok_area & (tid >= 0)

        for pg in range(n_pg):                         # static unroll
            flat = lane + pg * _LANES
            px = (flat % tile + x0).astype(jnp.float32) + 0.5
            py = (flat // tile + y0).astype(jnp.float32) + 0.5

            w0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)   # (8, 128)
            w1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
            w2 = e_ba_x * (py - ay) - e_ba_y * (px - ax)

            pos = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            neg = (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
            inside = (pos | neg) & live

            l0 = w0 * inv_area
            l1 = w1 * inv_area
            z = l0 * az + l1 * bz + (1.0 - l0 - l1) * cz

            zfl = zfl_all[pg:pg + 1, :]                # (1, 128)
            zok = (z > zfl + 1e-7) & (z >= -1.0) & (z <= 1.0)
            zc = jnp.where(inside & zok, z, BIG)       # (8, 128)

            # reduce the 8-candidate group: nearest z, min tid on ties
            zmin = jnp.min(zc, axis=0, keepdims=True)  # (1, 128)
            tmin = jnp.min(jnp.where(zc <= zmin, tid, BIG), axis=0,
                           keepdims=True)
            upd = zmin < best_z[pg]                    # strict: earliest wins
            best_z[pg] = jnp.where(upd, zmin, best_z[pg])
            best_t[pg] = jnp.where(upd, tmin, best_t[pg])

    outz_ref[0] = jnp.concatenate(best_z, axis=0)
    outt_ref[0] = jnp.concatenate(best_t, axis=0)


def tile_zmin_pallas(cand, tile_tris, z_floor_tiles, ntx: int,
                     tile: int, interpret: bool = False):
    """cand: (T, K, 9) f32; tile_tris: (T, K) i32; z_floor_tiles:
    (T, tile, tile) f32; ntx: static tiles-per-row (tile t sits at pixel
    origin ((t % ntx) * tile, (t // ntx) * tile), recomputed in-kernel).
    Returns (best_tri (T, tile, tile) i32, best_z (T, tile, tile) f32)."""
    T, K, _ = cand.shape
    assert tile * tile % _LANES == 0
    n_pg = tile * tile // _LANES
    Kp = -(-K // _CGS) * _CGS
    n_cgs = Kp // _CGS

    # pack [9 coords, float tid] into 16 lanes per candidate row; pad rows
    # carry tid = -1 so they never win
    packed = jnp.concatenate(
        [cand, tile_tris.astype(jnp.float32)[..., None],
         jnp.zeros((T, K, 6), jnp.float32)], axis=-1)
    if Kp > K:
        pad_row = jnp.zeros((16,), jnp.float32).at[9].set(-1.0)
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(pad_row, (T, Kp - K, 16))], axis=1)

    zfl = z_floor_tiles.reshape(T, n_pg, _LANES)

    kern = functools.partial(_kernel, tile=tile, ntx=ntx)
    pix_spec = pl.BlockSpec((1, n_pg, _LANES), lambda t, cg: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    outz, outt = pl.pallas_call(
        kern,
        grid=(T, n_cgs),
        in_specs=[
            pl.BlockSpec((1, _CGS, 16), lambda t, cg: (t, cg, 0),
                         memory_space=pltpu.VMEM),
            pix_spec,
        ],
        out_specs=[pix_spec, pix_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, n_pg, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, n_pg, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(packed, zfl)

    best_z = outz.reshape(T, tile, tile)
    best_tf = outt.reshape(T, tile, tile)
    hit = best_z < BIG
    best_tri = jnp.where(hit, best_tf, -1.0).astype(jnp.int32)
    return best_tri, best_z
