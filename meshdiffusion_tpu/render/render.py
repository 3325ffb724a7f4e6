"""Deferred mesh renderer: rasterize -> interpolate -> shade -> composite.

Counterpart of reference ``nvdiffrec/lib/render/render.py`` (shade:26-138,
render_layer:146-227, render_mesh:235-409, render_uv:414-432) on top of the
TPU-native rasterizer. Differences by design:

* fixed shapes end-to-end (vmappable over the camera batch, jit-able);
* ``visible_tet_id`` is returned as a fixed-size boolean mask over tets
  instead of a dynamic index list (reference render.py:346-407);
* composite antialiasing (dr.antialias, reference render.py:262) is the
  analytic edge-AA pass in rasterize.antialias — coverage gradients flow
  to vertex positions for 'shaded' and normal buffers, as in the reference.

The live MeshDiffusion shading path is bsdf='diffuse' with a constant kd and
an environment light (reference render.py:100-104, eval.py:422-428).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from . import utils
from .light import EnvironmentLight
from .mesh import Mesh
from .rasterize import (BIG, RasterOut, antialias, antialias_views,
                        compact_pixels, interpolate, rasterize,
                        rasterize_apply, rasterize_apply_compact,
                        rasterize_select, scatter_pixels)
from .texture import Texture2D


def _constant_or_sample(tex, gb_texc, gb_texc_deriv, like):
    """Texture2D sample; constant broadcast when no texcoords (the fitting
    path, reference render.py:66-68)."""
    if isinstance(tex, Texture2D):
        if gb_texc is None or tex.get_mips()[0].shape[1] == 1:
            const = tex.get_mips()[0][0, 0, 0]
            return jnp.broadcast_to(const, like.shape[:-1] + (const.shape[-1],))
        return tex.sample(gb_texc, gb_texc_deriv)
    arr = jnp.asarray(tex, jnp.float32)
    return jnp.broadcast_to(arr, like.shape[:-1] + (arr.shape[-1],))


def shade(gb_pos, gb_geometric_normal, gb_normal, gb_tangent, gb_texc,
          gb_texc_deriv, view_pos, lgt, material, bsdf,
          xfm_lgt=None, rng: Optional[jax.Array] = None
          ) -> Dict[str, jnp.ndarray]:
    """Pixel shader (reference render.py:26-138). view_pos: (..., 3)."""
    perturbed_nrm = None
    if 'kd_ks_normal' in material:
        tex = material['kd_ks_normal']
        if rng is not None:
            jitter = gb_pos + 0.01 * jax.random.normal(rng, gb_pos.shape)
        else:
            jitter = gb_pos
        all_tex = tex.sample(gb_pos)
        all_tex_jitter = tex.sample(jitter)
        kd, ks, perturbed_nrm = (all_tex[..., :-6], all_tex[..., -6:-3],
                                 all_tex[..., -3:])
        kd_grad = jnp.sum(jnp.abs(all_tex_jitter[..., :-6] - all_tex[..., :-6]),
                          axis=-1, keepdims=True) / 3
    else:
        kd = _constant_or_sample(material['kd'], gb_texc, gb_texc_deriv, gb_pos)
        ks = _constant_or_sample(material['ks'], gb_texc, gb_texc_deriv,
                                 gb_pos)[..., 0:3]
        if rng is not None and gb_texc is not None:
            texc_j = gb_texc + 0.005 * jax.random.normal(rng, gb_texc.shape)
            kd_jitter = _constant_or_sample(material['kd'], texc_j,
                                            gb_texc_deriv, gb_pos)
        else:
            kd_jitter = kd
        kd_grad = jnp.sum(jnp.abs(kd_jitter[..., 0:3] - kd[..., 0:3]),
                          axis=-1, keepdims=True) / 3

    alpha = kd[..., 3:4] if kd.shape[-1] == 4 else jnp.ones_like(kd[..., 0:1])
    kd = kd[..., 0:3]

    if material.get('no_perturbed_nrm'):
        perturbed_nrm = None

    gb_normal_s = ops.prepare_shading_normal(
        gb_pos, view_pos, perturbed_nrm, gb_normal, gb_tangent,
        gb_geometric_normal, two_sided_shading=True, opengl=True)
    gb_geo_corrected = ops.prepare_shading_normal(
        gb_pos, view_pos, None, gb_geometric_normal, gb_tangent,
        gb_geometric_normal, two_sided_shading=True, opengl=True)

    bsdf = material.get('bsdf') if bsdf is None else bsdf
    if bsdf == 'pbr':
        raise NotImplementedError(
            "pbr split-sum path disabled for parity (reference render.py:93-95 raises)")
    elif bsdf == 'diffuse':
        assert isinstance(lgt, EnvironmentLight), 'Invalid light type'
        shaded_col = lgt.shade(gb_pos, gb_geo_corrected, kd, ks, view_pos,
                               specular=False, xfm_lgt=xfm_lgt)
    elif bsdf == 'normal':
        shaded_col = (gb_normal_s + 1.0) * 0.5
    elif bsdf == 'tangent':
        shaded_col = (gb_tangent + 1.0) * 0.5
    elif bsdf == 'kd':
        shaded_col = kd
    elif bsdf == 'ks':
        shaded_col = ks
    else:
        raise ValueError(f"Invalid BSDF '{bsdf}'")

    depth = jnp.sqrt(jnp.sum((gb_pos - view_pos) ** 2, axis=-1,
                             keepdims=True) + 1e-20)
    cat = lambda a: jnp.concatenate([a, alpha], axis=-1)
    return {
        'shaded': cat(shaded_col),
        'kd_grad': cat(kd_grad),
        'occlusion': cat(ks[..., :1]),
        'normal': cat(gb_normal_s),
        'depth': cat(depth),
        'pos': cat(gb_pos),
        'geo_normal': cat(gb_geo_corrected),
        'geo_viewdir': cat(view_pos - gb_pos),
        'alpha': alpha,
    }


def render_layer(rast: RasterOut, mesh: Mesh, view_pos, lgt, bsdf,
                 xfm_lgt=None, rng=None, flat_shading=False
                 ) -> Dict[str, jnp.ndarray]:
    """Interpolate G-buffer attributes and shade one depth layer
    (reference render.py:146-227)."""
    faces = mesh.t_pos_idx
    v0 = mesh.v_pos[faces[:, 0]]
    v1 = mesh.v_pos[faces[:, 1]]
    v2 = mesh.v_pos[faces[:, 2]]
    face_normals = utils.safe_normalize(jnp.cross(v1 - v0, v2 - v0))
    safe = jnp.maximum(rast.tri_id, 0)

    # TPU gathers dominate this pipeline (~3 ms per 262k-row gather);
    # DMTet meshes always alias t_nrm_idx/t_tng_idx to t_pos_idx
    # (mesh.py auto_normals/compute_tangents), so the pos/normal/tangent
    # interpolations collapse into ONE gather of a concatenated
    # attribute table — and one scatter in the backward pass.
    fused = (not flat_shading and mesh.v_nrm is not None
             and mesh.t_nrm_idx is faces
             and (mesh.v_tng is None or mesh.t_tng_idx is faces))
    if fused:
        parts = [mesh.v_pos, mesh.v_nrm]
        if mesh.v_tng is not None:
            parts.append(mesh.v_tng)
        gb = interpolate(jnp.concatenate(parts, axis=1), rast, faces)
        gb_pos = gb[..., 0:3]
        gb_normal = gb[..., 3:6]
        gb_tangent = gb[..., 6:9] if mesh.v_tng is not None else None
        gb_geometric_normal = jnp.where(rast.valid[..., None],
                                        face_normals[safe], 0.0)
    else:
        gb_pos = interpolate(mesh.v_pos, rast, faces)
        if flat_shading or mesh.v_nrm is None:
            gb_normal = jnp.where(rast.valid[..., None],
                                  face_normals[safe], 0.0)
            gb_geometric_normal = gb_normal
        else:
            # geometric normal = the winning face's normal (per face)
            gb_geometric_normal = jnp.where(rast.valid[..., None],
                                            face_normals[safe], 0.0)
            gb_normal = interpolate(mesh.v_nrm, rast, mesh.t_nrm_idx)
        gb_tangent = (interpolate(mesh.v_tng, rast, mesh.t_tng_idx)
                      if mesh.v_tng is not None else None)
    gb_texc, gb_texc_deriv = None, None

    buffers = shade(gb_pos, gb_geometric_normal, gb_normal, gb_tangent,
                    gb_texc, gb_texc_deriv, view_pos, lgt, mesh.material,
                    bsdf, xfm_lgt=xfm_lgt, rng=rng)

    # interpolate(ones) is identically the coverage mask: the
    # perspective-correct barycentrics are normalized to sum to 1
    # (rasterize._barycentrics), and interpolate zeroes invalid pixels
    mask_cont = rast.valid[..., None].astype(jnp.float32)
    buffers['mask'] = mask_cont
    buffers['mask_cont'] = mask_cont
    return buffers


def render_mesh(mesh: Mesh, mtx_in: jnp.ndarray, view_pos: jnp.ndarray,
                lgt, resolution: Tuple[int, int], spp: int = 1,
                num_layers: int = 2, msaa: bool = False,
                background: Optional[jnp.ndarray] = None, bsdf=None,
                xfm_lgt=None, tet_centers: Optional[jnp.ndarray] = None,
                rng: Optional[jax.Array] = None, flat_shading: bool = False,
                raster_K: int = 256, raster_Kg: int = 64, aa: bool = True,
                aa_budget: Optional[int] = None, raster_live: int = 65536,
                remat: bool = False, shade_cap: Optional[int] = None
                ) -> Dict[str, jnp.ndarray]:
    """Two-layer depth-peeled render of a camera batch
    (reference render.py:235-409).

    mtx_in: (B, 4, 4) mvp; view_pos: (B, 3). Returns (B, H, W, C) buffers.

    ``shade_cap``: when set, the per-pixel chain (barycentrics +
    interpolate + shade) runs over a compacted list of at most ``shade_cap``
    covered pixels per view/layer instead of dense H x W, then scatters back
    before composite/AA — exact where coverage fits; the ``shade_overflow``
    output counts dropped covered pixels (grow the cap and re-jit, like
    raster_K). None = dense.
    """
    mtx_in = jnp.asarray(mtx_in, jnp.float32)
    view_pos = jnp.asarray(view_pos, jnp.float32)
    if mtx_in.ndim == 2:
        mtx_in = mtx_in[None]
    if view_pos.ndim == 1:
        view_pos = view_pos[None]
    B = mtx_in.shape[0]
    full_res = (resolution[0] * spp, resolution[1] * spp)

    v_clip = ops.xfm_points(jnp.broadcast_to(mesh.v_pos[None],
                                             (B,) + mesh.v_pos.shape), mtx_in)

    # triangle SELECTION (binning + tile z-test) runs OUTSIDE the remat
    # region: it is stop-gradient anyway, so re-running it in the backward
    # pass (which jax.checkpoint(one_view) did) would double its cost; the
    # checkpointed body receives the small (L, H, W) int selections as
    # saved inputs instead.
    tri_sel, tile_over, global_over, live_over = jax.vmap(
        lambda vc: rasterize_select(vc, mesh.t_pos_idx, full_res,
                                    face_mask=mesh.face_mask,
                                    num_layers=num_layers,
                                    K=raster_K, Kg=raster_Kg,
                                    live_cap=raster_live))(v_clip)

    # covered-pixel compaction for the shading chain: selection indices are
    # stop-gradient and computed OUTSIDE the remat region (like tri_sel),
    # so the backward pass re-reads them instead of redoing the cumsum.
    if shade_cap is not None:
        pix_idx, pix_valid, shade_over = jax.vmap(jax.vmap(
            lambda t: compact_pixels(t, shade_cap)))(tri_sel)

    def one_view(v_clip_b, tri_sel_b, view_pos_b, rng_b,
                 idx_b=None, selv_b=None):
        if idx_b is None:
            layers = rasterize_apply(v_clip_b, mesh.t_pos_idx, tri_sel_b,
                                     full_res)
            vp = view_pos_b[None, None, :]
            bufs = []
            for rast in layers:
                bufs.append(render_layer(rast, mesh, vp, lgt, bsdf,
                                         xfm_lgt=xfm_lgt, rng=rng_b))
            return tuple(bufs), tuple(layers)
        # compact path: per-pixel chain over (cap,) slots, scatter dense
        bufs, rasts = [], []
        for li in range(tri_sel_b.shape[0]):
            rast_c = rasterize_apply_compact(
                v_clip_b, mesh.t_pos_idx, tri_sel_b[li], idx_b[li],
                selv_b[li], full_res)
            buf_c = render_layer(rast_c, mesh, view_pos_b[None, :], lgt,
                                 bsdf, xfm_lgt=xfm_lgt, rng=rng_b)
            dense_valid = tri_sel_b[li] >= 0
            buf = {k: scatter_pixels(v, idx_b[li], selv_b[li], full_res)
                   for k, v in buf_c.items()
                   if k not in ('mask', 'mask_cont')}
            m = dense_valid[..., None].astype(jnp.float32)
            buf['mask'] = m
            buf['mask_cont'] = m
            bufs.append(buf)
            rasts.append(RasterOut(
                tri_id=tri_sel_b[li],
                bary=jnp.zeros(full_res + (3,), jnp.float32),
                zbuf=scatter_pixels(rast_c.zbuf, idx_b[li], selv_b[li],
                                    full_res, fill=float(BIG)),
                valid=dense_valid))
        return tuple(bufs), tuple(rasts)

    # vmap over the camera batch: ONE traced view instead of B copies of
    # the whole rasterize+shade graph — B-fold smaller programs (the
    # unrolled 512^2 batch-4 fit step was 8.6 MB of MLIR and crashed the
    # AOT compiler) and faster compiles everywhere. remat: recompute the
    # barycentrics+shade forward during the backward pass instead of
    # storing its intermediates (the differentiated 512^2 batch-4 fit step
    # otherwise needs 21 GB of HBM).
    body = jax.checkpoint(one_view) if remat else one_view
    if shade_cap is not None:
        # compact path: the per-view (L, cap) index/valid selections ride
        # the vmap alongside tri_sel (advisor round 4: they were computed
        # but never threaded, leaving the dense branch always live)
        if rng is not None:
            view_bufs, view_rasts = jax.vmap(body)(
                v_clip, tri_sel, view_pos, jax.random.split(rng, B),
                pix_idx, pix_valid)
        else:
            view_bufs, view_rasts = jax.vmap(
                lambda vc, ts, vp, ib, sb: body(vc, ts, vp, None, ib, sb))(
                    v_clip, tri_sel, view_pos, pix_idx, pix_valid)
    elif rng is not None:
        view_bufs, view_rasts = jax.vmap(body)(
            v_clip, tri_sel, view_pos, jax.random.split(rng, B))
    else:
        view_bufs, view_rasts = jax.vmap(
            lambda vc, ts, vp: body(vc, ts, vp, None))(v_clip, tri_sel,
                                                       view_pos)

    def stack_layer(li, key):
        return view_bufs[li][key]          # (B, H, W, C)

    def stack_rast_valid(li):
        return view_rasts[li].valid        # (B, H, W)

    if background is None:
        background = jnp.zeros((1, full_res[0], full_res[1], 4), jnp.float32)
    else:
        if background.shape[-1] == 3:
            background = jnp.concatenate(
                [background, jnp.zeros_like(background[..., :1])], axis=-1)

    aa_overflows = []

    def composite(key, li, bg, want_aa=False):
        buf = stack_layer(li, key)
        valid = stack_rast_valid(li)[..., None].astype(jnp.float32)
        alpha = valid * buf[..., -1:]
        fg = jnp.concatenate([buf[..., :-1], jnp.ones_like(buf[..., -1:])],
                             axis=-1)
        img = bg + alpha * (fg - bg)
        if want_aa and aa:
            # analytic edge AA per view (reference render.py:262 applies
            # dr.antialias to 'shaded' and normal composites) — the
            # coverage-gradient path to vertex positions. Default 'flat'
            # packs all views into one call whose backward is one scatter
            # per direction; vmap(antialias) measured ~4.5x slower inside
            # the differentiated fit graph (round-3 decomp).
            import os
            img = jnp.broadcast_to(img, (B,) + img.shape[1:])
            impl = os.environ.get('MESHDIFFUSION_AA_IMPL', 'compact')
            if impl == 'vmap':
                img = jax.vmap(antialias, in_axes=(0, 0, 0, None))(
                    img, view_rasts[li], v_clip, mesh.t_pos_idx)
            else:
                img, aa_over = antialias_views(
                    img, view_rasts[li].tri_id, view_rasts[li].valid,
                    view_rasts[li].zbuf, v_clip, mesh.t_pos_idx,
                    impl=impl, budget=aa_budget)
                aa_overflows.append(aa_over)
        return img

    out: Dict[str, jnp.ndarray] = {}
    keys = view_bufs[0].keys()
    for key in keys:
        if key == 'shaded':
            out[key] = composite(key, 0, background, want_aa=True)
        elif key in ('depth', 'pos'):
            base = jnp.ones_like(stack_layer(0, key)) * 20.0
            out[key] = composite(key, 0, base)
        else:
            out[key] = composite(key, 0, jnp.zeros_like(stack_layer(0, key)),
                                 want_aa='normal' in key)

    if num_layers > 1:
        out['shaded_second'] = composite('shaded', 1, background,
                                         want_aa=True)
        out['depth_second'] = composite(
            'depth', 1, -jnp.ones_like(stack_layer(1, 'depth')))
        out['normal_second'] = composite(
            'normal', 1, jnp.zeros_like(stack_layer(1, 'normal')))

    rast0_valid = stack_rast_valid(0)
    out['rast_depth'] = view_rasts[0].zbuf
    # binning-overflow diagnostics (scalars): triangles dropped from the
    # fullest tile (grow K) / the global big-triangle list (grow Kg) across
    # views; the fit driver watches these and re-jits with a larger capacity
    out['raster_overflow'] = jnp.max(tile_over)
    out['raster_overflow_global'] = jnp.max(global_over)
    # live faces dropped by the pre-binning compaction (grow raster_live)
    out['raster_overflow_live'] = jnp.max(live_over)
    # silhouette pairs dropped by the compacted AA pass (grow aa_budget)
    out['aa_overflow'] = (jnp.max(jnp.stack(aa_overflows))
                          if aa_overflows else jnp.zeros((), jnp.int32))
    # covered pixels dropped by the shading compaction (grow shade_cap)
    out['shade_overflow'] = (jnp.max(shade_over) if shade_cap is not None
                             else jnp.zeros((), jnp.int32))
    # fixed-size replacement for the reference's dynamic triangle-id list:
    F = mesh.t_pos_idx.shape[0]
    tri0 = view_rasts[0].tri_id
    hit = jnp.zeros((F,), bool).at[jnp.maximum(tri0.reshape(-1), 0)].max(
        (tri0 >= 0).reshape(-1))
    out['rast_triangle_mask'] = hit

    if tet_centers is not None:
        out['visible_tet_mask'] = visible_tets(
            tet_centers, mtx_in, view_pos, out['depth'], rast0_valid, full_res)
    if spp > 1:
        for k, v in list(out.items()):
            if v.ndim == 4 and v.shape[1] == full_res[0]:
                out[k] = utils.avg_pool_nhwc(v, spp)
    return out


def visible_tets(tet_centers: jnp.ndarray, mtx_in: jnp.ndarray,
                 view_pos: jnp.ndarray, depth_img: jnp.ndarray,
                 rast_valid: jnp.ndarray, full_res,
                 depth_search_range: int = 7) -> jnp.ndarray:
    """Neighborhood-min depth test marking non-occluded tets
    (reference render.py:346-407). Returns (T,) bool mask (union over the
    camera batch)."""
    B = mtx_in.shape[0]
    T = tet_centers.shape[0]
    H, W = full_res
    k = 2 * depth_search_range + 1

    homo = ops.xfm_points(jnp.broadcast_to(tet_centers[None],
                                           (B,) + tet_centers.shape), mtx_in)
    ndc = homo[..., :3] / jnp.where(jnp.abs(homo[..., 3:4]) > 1e-9,
                                    homo[..., 3:4], 1e-9)
    px = jnp.round((ndc[..., 0] * 0.5 + 0.5) * (W - 1)).astype(jnp.int32)
    py = jnp.round((ndc[..., 1] * 0.5 + 0.5) * (H - 1)).astype(jnp.int32)
    in_view = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1))
    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)

    # camera-space euclidean depth image; empty pixels -> 100
    d = depth_img[..., 0]
    d = jnp.where(rast_valid, d, 100.0)
    dmin = -jax.lax.reduce_window(-d, -jnp.inf, jax.lax.max,
                                  (1, k, k), (1, 1, 1), 'SAME')
    empty = ~rast_valid
    empty_min = -jax.lax.reduce_window(-(empty.astype(jnp.float32)), -jnp.inf,
                                       jax.lax.max, (1, k, k), (1, 1, 1),
                                       'SAME') > 0.5

    tet_depth = jnp.sqrt(jnp.sum(
        (tet_centers[None] - view_pos[:, None, :]) ** 2, axis=-1))
    # NOTE: the reference compares against clip-space z here
    # (render.py:368,395) while the depth image is camera-space distance —
    # we use camera distance on both sides (the intended test).
    ref_depth = dmin[jnp.arange(B)[:, None], pyc, pxc]
    depth_ok = ref_depth >= tet_depth
    empty_ok = empty_min[jnp.arange(B)[:, None], pyc, pxc]
    vis = in_view & (depth_ok | empty_ok)
    return jnp.any(vis, axis=0)


def render_uv(mesh: Mesh, resolution, mlp_texture):
    """Bake MLP texture into UV space (reference render.py:414-432)."""
    uv_clip = mesh.v_tex * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        [uv_clip, jnp.zeros_like(uv_clip[..., :1]),
         jnp.ones_like(uv_clip[..., :1])], axis=-1)
    # live_cap >= F disables the pre-binning live-face compaction: the bake
    # has no driver watching live_overflow, and 128-grid meshes routinely
    # exceed the fit path's default budget — a silent drop here would bake
    # an atlas with missing charts.
    rast = rasterize(uv_clip4, mesh.t_tex_idx, resolution,
                     live_cap=int(mesh.t_tex_idx.shape[0]))[0]
    gb_pos = interpolate(mesh.v_pos, rast, mesh.t_pos_idx)
    all_tex = mlp_texture.sample(gb_pos)
    mask = rast.valid[..., None].astype(jnp.float32)
    return (mask, all_tex[..., :-6], all_tex[..., -6:-3],
            utils.safe_normalize(all_tex[..., -3:]))
