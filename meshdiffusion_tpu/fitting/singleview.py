"""Single-view DMTet fitting with visibility extraction (feeds cond_gen).

Counterpart of reference ``nvdiffrec/fit_singleview.py`` +
``lib/geometry/dmtet_singleview.py``: fit one FIXED validation view
(pose ``angle_ind``), bootstrap occupancy from the GT depth surface every 10
iterations (knn to surface face centers with a normal half-space sign test,
dmtet_singleview.py:421-435), then extract per-tet-vertex visibility labels
{sdf, deform, vis, vis_rast} (fit_singleview.py:795-827) — the conditioning
input consumed by ``evaler.cond_gen``.

Differences from the multiview fitter (dmtet_singleview.py vs dmtet.py):
* deform frozen for the first 100 iters (:440-445);
* outside-mask carving CLAMPS sdf to |sdf| instead of resetting (:447-458);
* sdf BCE weight x2.5 (:501); single-layer image/depth terms only.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.fit_losses import (chamfer_distance, knn_dist, sample_points,
                                   sdf_reg_loss)
from ..geometry.tet_grid import TetGrid
from ..render import ops as rops
from ..render.render import render_mesh
from .dataset import TargetRenderer
from .fit import (FitConfig, _save_dmt_dict, default_material, lr_schedule,
                  make_image_loss)
from .geometry import DMTetFitter, FitState

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SingleViewFitter(DMTetFitter):
    """dmtet_singleview.py variant of the pass-1 fitter."""

    def carve_occluded(self, state: FitState, target: Dict, iteration
                       ) -> FitState:
        """Outside the view mask, clamp sdf to be non-negative
        (dmtet_singleview.py:447-458) instead of resetting it."""
        do = ((iteration > 200) & (iteration < 2000) & (iteration % 20 == 0))
        v = self.get_deformed(state)
        mvp = target['mvp']
        B = mvp.shape[0]
        res = target['img'].shape[1]
        homo = rops.xfm_points(jnp.broadcast_to(v[None], (B,) + v.shape), mvp)
        xy = homo[..., :2] / jnp.where(jnp.abs(homo[..., 3:4]) > 1e-9,
                                       homo[..., 3:4], 1e-9)
        pix = jnp.round(jnp.clip(xy * 0.5 + 0.5, 0, 1)
                        * (res - 1)).astype(jnp.int32)
        empty = target['mask_cont'][..., 0] == 0
        outside = empty[jnp.arange(B)[:, None], pix[..., 1], pix[..., 0]]
        outside_any = jnp.any(outside, axis=0) & do
        sdf = jnp.where(outside_any, jnp.clip(jnp.abs(state.sdf), 0.0, 1.0),
                        state.sdf)
        return state.replace(sdf=sdf)

    def init_with_gt_surface(self, state: FitState, gt_verts: jnp.ndarray,
                             surface_faces: jnp.ndarray, campos: jnp.ndarray
                             ) -> FitState:
        """Set sdf=+1 (outside) for tet verts on the far side of the nearest
        visible GT face (dmtet_singleview.py:421-435)."""
        face_verts = gt_verts[surface_faces]               # (F, 3, 3)
        centers = face_verts.mean(axis=1)
        v_pos = self.get_deformed(state)
        # nearest surface center per tet vertex (exact, chunked)
        d2 = knn_dist(centers, v_pos, k=1)
        # recover the argmin via a second pass (chunked argmin)
        def argmin_chunked(q, pts, chunk=4096):
            n = pts.shape[0]
            pad = (-n) % chunk
            pp = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=1e9)

            def body(carry, sc):
                best_d, best_i = carry
                offset, pc = sc
                d = (jnp.sum(q ** 2, -1)[:, None] - 2 * q @ pc.T
                     + jnp.sum(pc ** 2, -1)[None, :])
                d = jnp.maximum(d, 0.0)
                i = jnp.argmin(d, axis=1)
                dm = jnp.take_along_axis(d, i[:, None], 1)[:, 0]
                upd = dm < best_d
                return (jnp.where(upd, dm, best_d),
                        jnp.where(upd, i + offset, best_i)), None

            offs = jnp.arange(0, pp.shape[0], chunk)
            (bd, bi), _ = jax.lax.scan(
                body, (jnp.full((q.shape[0],), jnp.inf),
                       jnp.zeros((q.shape[0],), jnp.int32)),
                (offs, pp.reshape(-1, chunk, 3)))
            return bi

        nn_idx = argmin_chunked(v_pos, centers)
        displacement = v_pos - centers[nn_idx]
        view_dirs = campos - centers
        normals = jnp.cross(face_verts[:, 0] - face_verts[:, 1],
                            face_verts[:, 0] - face_verts[:, 2])
        facing = (jnp.sum(normals * view_dirs, -1, keepdims=True) >= 0)
        normals = jnp.where(facing, normals, -normals)
        outside = jnp.sum(displacement * normals[nn_idx], axis=-1) > 0
        return state.replace(sdf=jnp.where(outside, 1.0, state.sdf))

    def tick(self, state, material, lgt, target, iteration, key,
             image_loss_fn, no_depth_thin: bool = True, raster_K: int = 256):
        """Single-view loss (dmtet_singleview.py:438-514): single-layer image
        + depth, sdf BCE x2.5, kd/occlusion regs, chamfer."""
        m = self.get_mesh(state, material)
        res = (target['img'].shape[1], target['img'].shape[2])
        key_shade, key_pts = jax.random.split(key)
        buffers = render_mesh(m, target['mvp'], target['campos'], lgt, res,
                              num_layers=2, bsdf=None,
                              xfm_lgt=target.get('envlight_transform'),
                              rng=key_shade, raster_K=raster_K)
        t_iter = iteration / self.total_iter
        color_ref = target['img']
        img_loss = jnp.mean((buffers['shaded'][..., 3:]
                             - color_ref[..., 3:]) ** 2)
        img_loss += image_loss_fn(buffers['shaded'][..., :3] * color_ref[..., 3:],
                                  color_ref[..., :3] * color_ref[..., 3:])
        mask = (target['mask_cont'][..., 0] == 1.0).astype(jnp.float32)
        if no_depth_thin:
            valid_depth = ((target['depth_second'] >= 0).astype(jnp.float32)
                           * (jnp.abs(target['depth_second'] - target['depth'])
                              >= 5e-3).astype(jnp.float32))
        else:
            valid_depth = 1.0
        dd = jnp.abs(buffers['depth'][..., :1] - target['depth'][..., :1]) \
            * mask[..., None] * valid_depth
        small = (dd < 1.0).astype(dd.dtype)
        img_loss += jnp.mean(small * dd + (1 - small) * dd ** 2) * 100.0

        sdf_weight = self.sdf_regularizer - (self.sdf_regularizer - 0.01) \
            * jnp.minimum(1.0, 4.0 * t_iter)
        sdf_mask = m.valid_vert_idx.astype(jnp.float32)
        sdf_masked = jax.lax.stop_gradient(state.sdf) * sdf_mask \
            + state.sdf * (1 - sdf_mask)
        reg_loss = sdf_reg_loss(sdf_masked,
                                jnp.asarray(self.grid.unique_edges)) \
            * sdf_weight * 2.5
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


def extract_visibility(fitter, state: FitState, renderer: TargetRenderer,
                       angle_ind: int = 10, raster_K: int = 256
                       ) -> Dict[str, np.ndarray]:
    """Per-tet-vertex visibility labels from the fitting view
    (reference fit_singleview.py:795-827). Returns numpy arrays."""
    grid = fitter.grid
    mv, mvp, campos = renderer.rotate_camera(angle_ind)
    m = fitter.get_mesh(state, default_material())
    centers = fitter.tet_centers(state)
    out = render_mesh(m, jnp.asarray(mvp), jnp.asarray(campos),
                      renderer.envlight, renderer.display_res, num_layers=1,
                      tet_centers=centers, raster_K=raster_K)

    visible_tets = np.asarray(out['visible_tet_mask'])
    # rasterized triangles -> their source tets (face slot k -> tet k//2)
    tri_mask = np.asarray(out['rast_triangle_mask'])
    face_tet = np.repeat(np.arange(grid.num_tets), 2)
    rast_tets = np.zeros(grid.num_tets, bool)
    rast_tets[face_tet[tri_mask]] = True

    tets = grid.indices
    vis_verts = np.zeros(grid.num_verts, np.float32)
    vis_verts[np.unique(tets[visible_tets])] = 1.0
    vis_rast_verts = vis_verts.copy()
    vis_rast_verts[np.unique(tets[visible_tets | rast_tets])] = 1.0

    return {
        'sdf': np.asarray(state.sdf),
        'deform': np.asarray(state.deform),
        'vis': vis_verts,
        'vis_rast': vis_rast_verts.astype(bool),
    }


def fit_singleview(mesh_path: str, cfg: FitConfig, out_dir: str,
                   angle_ind: int = 10, seed: int = 0,
                   gt_bootstrap_every: int = 10) -> str:
    """Fit one fixed view and write tets/dmtet.(pt|npz)
    (reference fit_singleview.py driver)."""
    from ..render import light as light_mod
    from ..render import mesh as mesh_mod
    from ..render import obj as obj_mod

    os.makedirs(os.path.join(out_dir, 'tets'), exist_ok=True)
    ref = obj_mod.load_mesh(mesh_path)
    lo, hi = mesh_mod.aabb(ref.v_pos)
    ref = mesh_mod.center_by_reference(ref, (np.asarray(lo), np.asarray(hi)),
                                       1.0)
    ref = mesh_mod.auto_normals(ref)
    ref.material = default_material()

    if cfg.learn_light or cfg.envmap is None:
        envlight = light_mod.create_trainable_env_rnd(512, scale=0.0, bias=0.5)
        envlight.build_mips()
    else:
        envlight = light_mod.load_env(cfg.envmap, scale=cfg.env_scale)

    renderer = TargetRenderer(ref_mesh=ref, envlight=envlight,
                              cam_radius=cfg.cam_radius,
                              train_res=cfg.train_res,
                              display_res=cfg.train_res,
                              num_surface_samples=cfg.surface_samples)

    grid = TetGrid.load(cfg.dmtet_grid, cfg.tet_root)
    fitter = SingleViewFitter(grid=grid, scale=cfg.mesh_scale,
                              deform_scale=cfg.first_stage_deform,
                              sdf_regularizer=cfg.sdf_regularizer,
                              total_iter=cfg.iter)
    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)
    state = fitter.init_state(k0)

    # fixed view: validation pose #angle_ind (fit_singleview.py:480-491)
    mv, mvp, campos = renderer.rotate_camera(angle_ind)
    image_loss_fn = make_image_loss(cfg.loss)
    tx = optax.adam(lr_schedule(cfg.learning_rate[0]))
    opt = tx.init({'sdf': state.sdf, 'deform': state.deform})

    key, kt = jax.random.split(key)
    target = renderer.render_target(jnp.asarray(mvp), jnp.asarray(campos), kt)

    def loss_fn(leaves, state, iteration, k):
        st = state.replace(sdf=leaves['sdf'], deform=leaves['deform'])
        img, reg, _ = fitter.tick(st, default_material(), envlight, target,
                                  iteration, k, image_loss_fn,
                                  raster_K=cfg.raster_K)
        return img + reg, (img, reg)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(state, opt, iteration, k):
        leaves = {'sdf': state.sdf, 'deform': state.deform}
        (total, (img, reg)), g = grad_fn(leaves, state, iteration, k)
        # deform frozen for the first 100 iters (dmtet_singleview.py:440-445)
        g['deform'] = jnp.where(iteration < 100,
                                jnp.zeros_like(g['deform']), g['deform'])
        up, opt = tx.update(g, opt, leaves)
        leaves = optax.apply_updates(leaves, up)
        state = state.replace(sdf=leaves['sdf'], deform=leaves['deform'])
        state = fitter.shrink_deform(state, iteration)
        state = fitter.carve_occluded(state, target, iteration)
        state = fitter.clamp(state)
        state = fitter.update_ema(state)
        return state, opt, img, reg

    gt_faces = ref.t_pos_idx
    bootstrap = jax.jit(lambda st: fitter.init_with_gt_surface(
        st, ref.v_pos, gt_faces, jnp.asarray(campos[0])))

    for it in range(cfg.iter):
        if it % gt_bootstrap_every == 0:
            state = bootstrap(state)
        key, ks = jax.random.split(key)
        state, opt, img, reg = step(state, opt, jnp.asarray(it, jnp.float32),
                                    ks)
        if it % cfg.log_interval == 0:
            logger.info('sv iter=%5d img=%.6f reg=%.6f', it, float(img),
                        float(reg))

    # freeze topology like pass 2 and extract visibility
    fitter2 = SingleViewFitter(grid=grid, scale=cfg.mesh_scale,
                               deform_scale=cfg.second_stage_deform,
                               total_iter=cfg.iter)
    state = state.replace(
        sdf=jnp.where(jnp.sign(state.sdf) == 0, 1.0, jnp.sign(state.sdf)),
        deform=state.deform * cfg.first_stage_deform / cfg.second_stage_deform)

    d = extract_visibility(fitter2, state, renderer, angle_ind,
                           raster_K=cfg.raster_K)
    path = _save_dmt_dict(os.path.join(out_dir, 'tets/dmtet'), d)
    logger.info('saved %s', path)
    return path
