"""DMTet fitting geometry: trainable SDF + deformation over the tet grid.

Functional counterpart of reference ``nvdiffrec/lib/geometry/dmtet.py``
(DMTetGeometry:203-462, Buffer sign-majority EMA:179-197) and
``dmtet_fixedtopo.py`` (DMTetGeometryFixedTopo:176-349). State lives in a
flax-struct pytree; every reference in-place mutation (deform clamp, EMA
push, occluded-region carving, periodic deform shrink) is a pure update
gated by iteration conditionals, so the whole fitting step jits.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.fit_losses import (chamfer_distance, laplacian_uniform,
                                   sample_points, sdf_reg_loss)
from ..geometry.marching_tets import marching_tets
from ..geometry.tet_grid import TetGrid
from ..render import mesh as mesh_mod
from ..render.render import render_mesh


class FitState(flax.struct.PyTreeNode):
    sdf: jnp.ndarray          # (V,)
    deform: jnp.ndarray       # (V, 3)
    sdf_ema: jnp.ndarray      # (V,) sign-majority snapshot
    sdf_buffer: jnp.ndarray   # (cap, V) ring buffer of sdf snapshots
    buf_len: jnp.ndarray      # int32
    buf_ptr: jnp.ndarray      # int32


@dataclasses.dataclass(frozen=True)
class DMTetFitter:
    """First-pass fitter: trainable sdf + deform (reference dmtet.py:203)."""

    grid: TetGrid
    scale: float = 1.1                 # mesh_scale (nvdiffrec config)
    deform_scale: float = 2.0
    sdf_regularizer: float = 0.2
    total_iter: int = 5000
    buffer_capacity: int = 200

    def init_state(self, key: jax.Array) -> FitState:
        V = self.grid.num_verts
        sdf = jax.random.uniform(key, (V,)) - 0.1   # reference dmtet.py:224
        return FitState(
            sdf=sdf,
            deform=jnp.zeros((V, 3)),
            sdf_ema=sdf,
            sdf_buffer=jnp.zeros((self.buffer_capacity, V)),
            buf_len=jnp.zeros((), jnp.int32),
            buf_ptr=jnp.zeros((), jnp.int32))

    # ---- geometry ----

    def get_deformed(self, state: FitState, ema: bool = False) -> jnp.ndarray:
        base = jnp.asarray(self.grid.verts) * self.scale
        return base + 2.0 / (self.grid.resolution * 2) * state.deform \
            * self.deform_scale

    def get_mesh(self, state: FitState, material=None, ema: bool = False
                 ) -> mesh_mod.Mesh:
        v = self.get_deformed(state, ema)
        sdf = state.sdf_ema if ema else state.sdf
        mt = marching_tets(self.grid, v, sdf)
        m = mesh_mod.Mesh(v_pos=mt.verts,
                          t_pos_idx=mt.faces,
                          face_mask=mt.face_mask,
                          material=material,
                          valid_vert_idx=mt.valid_vert_mask)
        return mesh_mod.auto_normals(m)

    def tet_centers(self, state: FitState) -> jnp.ndarray:
        v = self.get_deformed(state)
        return v[jnp.asarray(self.grid.indices)].mean(axis=1)

    # ---- in-loop state maintenance ----

    def clamp(self, state: FitState) -> FitState:
        """Reference dmtet.py:335-338."""
        return state.replace(deform=jnp.clip(state.deform, -0.99, 0.99),
                             sdf=jnp.clip(state.sdf, -1.0, 1.0))

    def update_ema(self, state: FitState) -> FitState:
        """Sign-majority ring buffer (reference dmtet.py:179-197,351-354)."""
        buf = state.sdf_buffer.at[state.buf_ptr].set(state.sdf)
        ptr = (state.buf_ptr + 1) % self.buffer_capacity
        length = jnp.minimum(state.buf_len + 1, self.buffer_capacity)
        idx = jnp.arange(self.buffer_capacity)
        w = (idx < length).astype(jnp.float32)[:, None]
        mean_sign = jnp.sum(jnp.sign(buf) * w, axis=0) / jnp.maximum(
            jnp.sum(w), 1.0)
        ema = jnp.sign(jnp.sign(mean_sign))
        return state.replace(sdf_buffer=buf, buf_ptr=ptr, buf_len=length,
                             sdf_ema=ema)

    def shrink_deform(self, state: FitState, iteration: jnp.ndarray
                      ) -> FitState:
        """deform *= 0.4 every 300 iters while iteration < 1790
        (reference dmtet.py:409-410)."""
        do = (iteration % 300 == 0) & (iteration < 1790)
        return state.replace(
            deform=jnp.where(do, state.deform * 0.4, state.deform))

    def carve_occluded(self, state: FitState, target: Dict, iteration
                       ) -> FitState:
        """Project verts to screen; force sdf=1e-2 (outside) where the
        dilated target mask is empty (reference dmtet.py:366-378)."""
        from ..render import ops as rops
        do = ((iteration > 200) & (iteration < 2000) & (iteration % 20 == 0))
        v = self.get_deformed(state)
        mvp = target['mvp']                                  # (B, 4, 4)
        B = mvp.shape[0]
        res = target['img'].shape[1]
        homo = rops.xfm_points(jnp.broadcast_to(v[None], (B,) + v.shape), mvp)
        xy = homo[..., :2] / jnp.where(jnp.abs(homo[..., 3:4]) > 1e-9,
                                       homo[..., 3:4], 1e-9)
        pix = jnp.round(jnp.clip(xy * 0.5 + 0.5, 0, 1) * (res - 1)).astype(jnp.int32)
        # dilated coverage: box filter of mask_cont > 0
        mask = (target['mask_cont'][..., 0] > 0).astype(jnp.float32)
        k = 11
        dil = jax.lax.reduce_window(mask, -jnp.inf, jax.lax.max,
                                    (1, k, k), (1, 1, 1), 'SAME')
        outside = dil[jnp.arange(B)[:, None], pix[..., 1], pix[..., 0]] == 0
        outside_any = jnp.any(outside, axis=0) & do
        sdf = jnp.where(outside_any, 1e-2, state.sdf)
        deform = jnp.where(outside_any[:, None], 0.0, state.deform)
        return state.replace(sdf=sdf, deform=deform)

    # ---- loss (reference dmtet.py:362-462) ----

    def tick(self, state: FitState, material, lgt, target: Dict,
             iteration: jnp.ndarray, key: jax.Array, image_loss_fn,
             no_depth_thin: bool = True, raster_K: int = 256,
             raster_Kg: int = 64,
             aa: bool = True, aa_budget=None, raster_live: int = 65536,
             shade_cap=None) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        m = self.get_mesh(state, material)
        res = (target['img'].shape[1], target['img'].shape[2])
        key_shade, key_pts = jax.random.split(key)
        buffers = render_mesh(m, target['mvp'], target['campos'], lgt, res,
                              num_layers=2, bsdf=None,
                              background=target.get('background'),
                              xfm_lgt=target.get('envlight_transform'),
                              rng=key_shade, raster_K=raster_K,
                              raster_Kg=raster_Kg, aa=aa,
                              aa_budget=aa_budget, raster_live=raster_live,
                              remat=True, shade_cap=shade_cap)

        t_iter = iteration / self.total_iter

        color_ref = target['img']
        img_loss = jnp.mean((buffers['shaded'][..., 3:] - color_ref[..., 3:]) ** 2)
        img_loss += image_loss_fn(buffers['shaded'][..., :3] * color_ref[..., 3:],
                                  color_ref[..., :3] * color_ref[..., 3:])
        ref2 = target['img_second']
        img_loss += jnp.mean((buffers['shaded_second'][..., 3:]
                              - ref2[..., 3:]) ** 2) * 1e-1
        img_loss += image_loss_fn(buffers['shaded_second'][..., :3] * ref2[..., 3:],
                                  ref2[..., :3] * ref2[..., 3:]) * 1e-1

        mask = (target['mask_cont'][..., 0] == 1.0).astype(jnp.float32)
        depth_scale = jnp.where(iteration < 10000, 100.0, 1.0)
        if no_depth_thin:
            valid_depth = (target['depth_second'] >= 0).astype(jnp.float32)
            depth_prox = (jnp.abs(target['depth_second'] - target['depth'])
                          >= 5e-3).astype(jnp.float32)
        else:
            valid_depth = 1.0
            depth_prox = 1.0

        dd = jnp.abs(buffers['depth'][..., :1] - target['depth'][..., :1]) \
            * mask[..., None] * valid_depth
        dd2 = jnp.abs(buffers['depth_second'][..., :1]
                      - target['depth_second'][..., :1]) \
            * mask[..., None] * valid_depth * depth_prox * 1e-1

        def huber(d, thres=1.0):
            small = (d < thres).astype(d.dtype)
            return small * d + (1 - small) * (d ** 2 + thres - thres ** 2)

        img_loss += (jnp.mean(huber(dd)) + jnp.mean(huber(dd2))) * depth_scale

        # SDF sign regularizer masked to non-surface verts (dmtet.py:439-446)
        sdf_weight = self.sdf_regularizer - (self.sdf_regularizer - 0.01) \
            * jnp.minimum(1.0, 4.0 * t_iter)
        sdf_mask = m.valid_vert_idx.astype(jnp.float32)
        sdf_masked = jax.lax.stop_gradient(state.sdf) * sdf_mask \
            + state.sdf * (1 - sdf_mask)
        reg_loss = sdf_reg_loss(sdf_masked,
                                jnp.asarray(self.grid.unique_edges)) \
            * sdf_weight * 0.1

        reg_loss += jnp.mean(buffers['kd_grad'][..., :-1]
                             * buffers['kd_grad'][..., -1:]) * 0.03 \
            * jnp.minimum(1.0, iteration / 500)
        reg_loss += jnp.mean(buffers['occlusion'][..., :-1]
                             * buffers['occlusion'][..., -1:]) * 1e0 \
            * jnp.minimum(1.0, iteration / 500)

        pred_pts = sample_points(m.v_pos, m.t_pos_idx, 50000, key_pts,
                                 face_mask=m.face_mask)
        reg_loss += chamfer_distance(pred_pts, target['spts'])

        return img_loss, reg_loss, buffers


@dataclasses.dataclass(frozen=True)
class FixedTopoFitter(DMTetFitter):
    """Second pass: topology frozen (sdf = its sign), deform-only, Laplacian
    regularized relative to the pass-1 vertices
    (reference dmtet_fixedtopo.py:176-349)."""

    laplace_scale: float = 10000.0

    def freeze(self, state: FitState) -> FitState:
        s = jnp.sign(state.sdf)
        s = jnp.where(s == 0, 1.0, s)
        return state.replace(sdf=s)

    def tick_fixed(self, state: FitState, init_v_pos: jnp.ndarray, material,
                   lgt, target: Dict, iteration: jnp.ndarray, key: jax.Array,
                   image_loss_fn, mesh_edges: jnp.ndarray,
                   raster_K: int = 256, raster_Kg: int = 64,
                   aa: bool = True, aa_budget=None, raster_live: int = 65536,
                   shade_cap=None):
        m = self.get_mesh(state, material)
        res = (target['img'].shape[1], target['img'].shape[2])
        key_shade, key_pts = jax.random.split(key)
        buffers = render_mesh(m, target['mvp'], target['campos'], lgt, res,
                              num_layers=2, bsdf=None,
                              background=target.get('background'),
                              xfm_lgt=target.get('envlight_transform'),
                              rng=key_shade, raster_K=raster_K,
                              raster_Kg=raster_Kg, aa=aa,
                              aa_budget=aa_budget, raster_live=raster_live,
                              remat=True, shade_cap=shade_cap)

        t_iter = iteration / self.total_iter
        color_ref = target['img']
        img_loss = jnp.mean((buffers['shaded'][..., 3:] - color_ref[..., 3:]) ** 2)
        img_loss += image_loss_fn(buffers['shaded'][..., :3] * color_ref[..., 3:],
                                  color_ref[..., :3] * color_ref[..., 3:])

        mask = (target['mask_cont'][..., 0] == 1.0).astype(jnp.float32)
        dd = jnp.abs(buffers['depth'][..., :1] - target['depth'][..., :1]) \
            * mask[..., None]

        def huber(d, thres=1.0):
            small = (d < thres).astype(d.dtype)
            return small * d + (1 - small) * (d ** 2 + thres - thres ** 2)

        img_loss += jnp.mean(huber(dd)) * 100.0

        # Laplacian relative to pass-1 verts (dmtet_fixedtopo.py:207-211,342)
        delta = m.v_pos - init_v_pos
        reg_loss = laplacian_uniform(delta, mesh_edges) \
            * self.laplace_scale * (1 - t_iter) * 1e-2

        pred_pts = sample_points(m.v_pos, m.t_pos_idx, 50000, key_pts,
                                 face_mask=m.face_mask)
        reg_loss += chamfer_distance(pred_pts, target['spts'])
        return img_loss, reg_loss, buffers
