"""DMTet dataset fitting: two-pass optimization of per-mesh SDF + deform.

Counterpart of reference ``nvdiffrec/fit_dmtets.py`` (optimize_mesh:372-534,
two-pass driver:636-812): per mesh, pass 1 optimizes sdf+deform (+neural
material) against on-the-fly GT renders; pass 2 freezes topology (sdf sign)
and refines deform with a relative Laplacian. TPU-native design:

* ONE jitted fit step per pass: GT target render + candidate render + losses
  + grads + two Adam updates + state maintenance (clamp/EMA/shrink/carve) —
  the reference's per-iter python bookkeeping is fused on device;
* the exponential lr falloff 10^(-it*2e-4) with warmup
  (reference fit_dmtets.py:396-399) as an optax schedule;
* the light-gradient x64 and hash-encoder /8 rescalings
  (reference fit_dmtets.py:484-492) as explicit gradient transforms;
* job sharding (--index/--split-size), skip-if-exists resume, and per-mesh
  try/except-continue fault tolerance are preserved (fit_dmtets.py:657-810).

Outputs match the reference's on-disk contract:
``tets_pre/dmt_dict_{i:05d}`` {sdf, sdf_ema, deform (masked), deform_unmasked}
and ``tets/dmt_dict_{i:05d}`` {sdf (sign), deform (masked), deform_unmasked}
(fit_dmtets.py:734-739,787-793), saved as .npz (a .pt writer is used when
torch is importable, for byte-compat with the reference pipeline).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import traceback
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.tet_grid import TetGrid
from ..render import light as light_mod
from ..render import material as material_mod
from ..render import mesh as mesh_mod
from ..render import obj as obj_mod
from ..render import texture as texture_mod
from ..render.mlptexture import MLPTexture3D, BoundTexture3D
from .dataset import TargetRenderer
from .geometry import DMTetFitter, FixedTopoFitter, FitState

logger = logging.getLogger(__name__)


def lr_schedule(base_lr: float, warmup_iter: int = 0):
    """Reference fit_dmtets.py:396-399."""
    def fn(it):
        it = jnp.asarray(it, jnp.float32)
        warm = it / max(warmup_iter, 1)
        falloff = 10.0 ** (-(it - warmup_iter) * 0.0002)
        return base_lr * jnp.where(it < warmup_iter, warm,
                                   jnp.maximum(falloff, 0.0))
    return fn


def make_image_loss(name: str = 'logl1'):
    """Reference eval.py:50-62 loss table."""
    from ..render.ops import image_loss
    table = {
        'smape': ('smape', 'none'),
        'mse': ('mse', 'none'),
        'logl1': ('l1', 'log_srgb'),
        'logl2': ('mse', 'log_srgb'),
        'relmse': ('relmse', 'none'),
    }
    loss, tm = table[name]
    return lambda img, ref: image_loss(img, ref, loss=loss, tonemapper=tm)


@dataclasses.dataclass
class FitConfig:
    """Mirror of nvdiffrec/configs/res64.json + argparse defaults."""
    iter: int = 5000
    batch: int = 4
    train_res: Tuple[int, int] = (512, 512)
    learning_rate: Tuple[float, float] = (0.01, 0.003)
    loss: str = 'logl1'
    dmtet_grid: int = 64
    mesh_scale: float = 1.1
    env_scale: float = 1.0
    envmap: Optional[str] = None
    first_stage_deform: float = 2.0
    second_stage_deform: float = 3.0
    sdf_regularizer: float = 0.2
    laplace_scale: float = 10000.0
    learn_light: bool = False
    random_lgt: bool = False
    cam_radius: float = 3.0
    tet_root: Optional[str] = None
    normal_only: bool = True
    raster_K: int = 256
    raster_Kg: int = 64            # global big-triangle list capacity
    antialias: bool = True     # analytic edge AA (dr.antialias equivalent)
    # compacted-AA silhouette-pair budget; None = B*(H+W)*8 heuristic.
    # The driver grows it on aa_overflow like raster_K.
    aa_budget: Optional[int] = None
    # pre-binning live-face compaction capacity (rasterize_select)
    raster_live: int = 65536
    # covered-pixel compaction for the shading chain (render_mesh
    # shade_cap): -1 = auto (H*W // 4), 0 = dense, >0 explicit cap.
    # The driver grows it on shade_overflow (hard ceiling H*W, where the
    # compact path covers every pixel).
    shade_cap: int = -1
    save_baked: bool = False   # UV-unwrap + bake MLP material after pass 2
    surface_samples: int = 50000
    # pre-rendered GT view-batch pool (TargetRenderer.target_pool): the
    # reference re-renders GT every iteration; pooling amortizes ~1 s/iter
    # into a per-mesh prologue. 0 restores exact reference behavior.
    target_pool: int = 64
    log_interval: int = 10
    validate: bool = False
    validate_views: int = 8


def default_material():
    """Reference fit_dmtets.py:638-645."""
    return material_mod.Material({
        'name': '_default_mat',
        'bsdf': 'diffuse',
        'uniform': True,
        'kd': texture_mod.Texture2D(np.asarray([0.75, 0.3, 0.6], np.float32)),
        'ks': texture_mod.Texture2D(np.asarray([0.0, 0.0, 0.0], np.float32)),
    })


def make_mlp_material(aabb, channels=9):
    """Neural kd_ks_normal material (reference eval.py:134-142)."""
    kd_min = np.asarray([0.0, 0.0, 0.0], np.float32)
    kd_max = np.asarray([1.0, 1.0, 1.0], np.float32)
    ks_min = np.asarray([0.0, 0.08, 0.0], np.float32)
    ks_max = np.asarray([1.0, 1.0, 1.0], np.float32)
    nrm_min = np.asarray([-1.0, -1.0, 0.0], np.float32)
    nrm_max = np.asarray([1.0, 1.0, 1.0], np.float32)
    mlp_min = np.concatenate([kd_min, ks_min, nrm_min])
    mlp_max = np.concatenate([kd_max, ks_max, nrm_max])
    module = MLPTexture3D(aabb=tuple(map(tuple, aabb)), channels=channels,
                          min_max=(tuple(mlp_min), tuple(mlp_max)))
    params = module.init(jax.random.key(7), jnp.zeros((8, 3)))
    return module, params


def _material_for_step(cfg: FitConfig, mat_module, mat_params):
    if cfg.normal_only or mat_module is None:
        return default_material()
    m = default_material()
    m['kd_ks_normal'] = BoundTexture3D(mat_module, mat_params)
    return m


def rescale_encoder_grads(g_mat):
    """Hash-encoder gradient /8 (reference fit_dmtets.py:486-487): every
    leaf under an 'encoder' path is scaled, all others untouched."""
    def rescale(path, g):
        name = '/'.join(str(p) for p in path)
        return g / 8.0 if 'encoder' in name else g
    return jax.tree_util.tree_map_with_path(rescale, g_mat)


def make_fit_step(fitter: DMTetFitter, cfg: FitConfig, renderer: TargetRenderer,
                  mat_module, pass_idx: int = 0,
                  init_v_pos: Optional[jnp.ndarray] = None,
                  mesh_edges: Optional[jnp.ndarray] = None):
    """Build the jitted one-iteration fit step for pass 1 or pass 2.

    Returns ``(step, tx_geo, tx_mat, tx_lgt)``. The step signature is
    ``step(state, mat_params, light_base, opt_geo, opt_mat, opt_lgt, target,
    iteration, key)``; pass ``light_base=None`` (with ``opt_lgt=None``) when
    the light is fixed. When a light base cubemap IS passed, its mips are
    rebuilt inside the differentiated step and it is optimized with the
    material schedule under the reference's x64 light-gradient boost
    (fit_dmtets.py:352,365 build_mips-per-forward; :424,484-485 optimizer +
    grad scale; :516 clamp_(min=0)).
    """
    image_loss_fn = make_image_loss(cfg.loss)
    lr_geo = lr_schedule(cfg.learning_rate[0],
                         warmup_iter=100 if pass_idx == 1 else 0)
    lr_mat = lr_schedule(cfg.learning_rate[1],
                         warmup_iter=100 if pass_idx == 1 else 0)
    tx_geo = optax.adam(lr_geo)
    tx_mat = optax.adam(lr_mat)
    tx_lgt = optax.adam(lr_mat)   # light rides the material lr schedule

    def loss_fn(geo_leaves, mat_params, light_base, target, iteration, key):
        state = target['_state'].replace(sdf=geo_leaves['sdf'],
                                         deform=geo_leaves['deform'])
        material = _material_for_step(cfg, mat_module, mat_params)
        if light_base is not None:
            lgt = light_mod.EnvironmentLight(light_base)
            lgt.build_mips()
        else:
            lgt = renderer.envlight
        tgt = {k: v for k, v in target.items() if not k.startswith('_')}
        H, W = cfg.train_res
        cap = (None if cfg.shade_cap == 0
               else (H * W // 4 if cfg.shade_cap < 0
                     else min(cfg.shade_cap, H * W)))
        if pass_idx == 0:
            img_loss, reg_loss, bufs = fitter.tick(
                state, material, lgt, tgt, iteration, key,
                image_loss_fn, raster_K=cfg.raster_K, raster_Kg=cfg.raster_Kg,
                aa=cfg.antialias, shade_cap=cap)
        else:
            img_loss, reg_loss, bufs = fitter.tick_fixed(
                state, init_v_pos, material, lgt, tgt,
                iteration, key, image_loss_fn, mesh_edges,
                raster_K=cfg.raster_K, raster_Kg=cfg.raster_Kg,
                aa=cfg.antialias, aa_budget=cfg.aa_budget,
                raster_live=cfg.raster_live, shade_cap=cap)
        overflow = bufs.get('raster_overflow', jnp.zeros((), jnp.int32))
        overflow_g = bufs.get('raster_overflow_global',
                              jnp.zeros((), jnp.int32))
        overflow_aa = bufs.get('aa_overflow', jnp.zeros((), jnp.int32))
        overflow_live = bufs.get('raster_overflow_live',
                                 jnp.zeros((), jnp.int32))
        overflow_shade = bufs.get('shade_overflow',
                                  jnp.zeros((), jnp.int32))
        return img_loss + reg_loss, (img_loss, reg_loss, overflow,
                                     overflow_g, overflow_aa,
                                     overflow_live, overflow_shade)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    def step(state: FitState, mat_params, light_base, opt_geo, opt_mat,
             opt_lgt, target: Dict, iteration, key):
        geo_leaves = {'sdf': state.sdf, 'deform': state.deform}
        target = dict(target)
        target['_state'] = state
        (total, (img_loss, reg_loss, overflow, overflow_g, overflow_aa,
                 overflow_live, overflow_shade)), \
            (g_geo, g_mat, g_lgt) = grad_fn(
                geo_leaves, mat_params, light_base, target, iteration, key)

        if pass_idx == 1:
            g_geo = dict(g_geo)
            g_geo['sdf'] = jnp.zeros_like(g_geo['sdf'])  # topology frozen
        up_geo, opt_geo = tx_geo.update(g_geo, opt_geo, geo_leaves)
        geo_leaves = optax.apply_updates(geo_leaves, up_geo)
        state = state.replace(sdf=geo_leaves['sdf'],
                              deform=geo_leaves['deform'])

        if mat_params is not None:
            g_mat = rescale_encoder_grads(g_mat)
            up_mat, opt_mat = tx_mat.update(g_mat, opt_mat, mat_params)
            mat_params = optax.apply_updates(mat_params, up_mat)

        if light_base is not None:
            g_lgt = g_lgt * 64.0        # reference fit_dmtets.py:484-485
            up_lgt, opt_lgt = tx_lgt.update(g_lgt, opt_lgt, light_base)
            light_base = optax.apply_updates(light_base, up_lgt)
            light_base = jnp.maximum(light_base, 0.0)   # lgt.clamp_(min=0)

        # state maintenance (reference fit_dmtets.py:501-502 + dmtet.py)
        if pass_idx == 0:
            state = fitter.shrink_deform(state, iteration)
            state = fitter.carve_occluded(state, target, iteration)
        state = fitter.clamp(state)
        state = fitter.update_ema(state)
        metrics = {'img_loss': img_loss, 'reg_loss': reg_loss, 'total': total,
                   'raster_overflow': overflow,
                   'raster_overflow_global': overflow_g,
                   'aa_overflow': overflow_aa,
                   'raster_overflow_live': overflow_live,
                   'shade_overflow': overflow_shade}
        return (state, mat_params, light_base, opt_geo, opt_mat, opt_lgt,
                metrics)

    return jax.jit(step), tx_geo, tx_mat, tx_lgt


def fit_one_mesh(mesh_path: str, cfg: FitConfig, out_dir: str,
                 global_index: int, seed: int = 0) -> Dict[str, str]:
    """Two-pass fit of one mesh; writes tets_pre/ and tets/ dicts."""
    os.makedirs(os.path.join(out_dir, 'tets_pre'), exist_ok=True)
    os.makedirs(os.path.join(out_dir, 'tets'), exist_ok=True)

    ref = obj_mod.load_mesh(mesh_path)
    lo, hi = mesh_mod.aabb(ref.v_pos)
    ref = mesh_mod.center_by_reference(ref, (np.asarray(lo), np.asarray(hi)),
                                       1.0)
    ref = mesh_mod.auto_normals(ref)
    if ref.material is None or cfg.normal_only:
        # reference loads with the default diffuse material when normal_only
        # (fit_dmtets.py:679 use_default=FLAGS.normal_only, mtl at :638-645)
        ref.material = default_material()

    if cfg.learn_light or cfg.envmap is None:
        envlight = light_mod.create_trainable_env_rnd(512, scale=0.0, bias=0.5)
        # when learn_light, the candidate render's light is optimized inside
        # the fit step (reference fit_dmtets.py:697,724,781); the GT target
        # renderer keeps this initial light either way
        envlight.build_mips()
    else:
        envlight = light_mod.load_env(cfg.envmap, scale=cfg.env_scale,
                                      trainable=False)  # build_mips inside

    renderer = TargetRenderer(ref_mesh=ref, envlight=envlight,
                              cam_radius=cfg.cam_radius,
                              train_res=cfg.train_res,
                              random_lgt=cfg.random_lgt,
                              num_surface_samples=cfg.surface_samples,
                              # a pool larger than the iteration count
                              # would cost more than it saves
                              target_pool=min(cfg.target_pool, cfg.iter))

    grid = TetGrid.load(cfg.dmtet_grid, cfg.tet_root)
    fitter = DMTetFitter(grid=grid, scale=cfg.mesh_scale,
                         deform_scale=cfg.first_stage_deform,
                         sdf_regularizer=cfg.sdf_regularizer,
                         total_iter=cfg.iter)

    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    state = fitter.init_state(k_init)

    if cfg.normal_only:
        mat_module, mat_params = None, None
    else:
        aabb = (np.asarray(lo), np.asarray(hi))
        mat_module, mat_params = make_mlp_material(aabb)

    np_rng = np.random.default_rng(seed)

    # the reference optimizes the light in both passes when learn_light
    # (pass 2 additionally gated on lock_light=False, the default:
    # fit_dmtets.py:582,724,781)
    light_base0 = envlight.base if cfg.learn_light else None

    def run_pass(fitter, state, mat_params, light_base, pass_idx,
                 init_v_pos=None, mesh_edges=None):
        pass_cfg = cfg
        step, tx_geo, tx_mat, tx_lgt = make_fit_step(fitter, pass_cfg,
                                                     renderer, mat_module,
                                                     pass_idx, init_v_pos,
                                                     mesh_edges)
        geo_leaves = {'sdf': state.sdf, 'deform': state.deform}
        opt_geo = tx_geo.init(geo_leaves)
        opt_mat = tx_mat.init(mat_params) if mat_params is not None else None
        opt_lgt = tx_lgt.init(light_base) if light_base is not None else None
        nonlocal key

        def grow_capacity(metrics, it):
            """Inspect overflow counters; grow K (per-tile) / Kg (global
            big-triangle list) and re-jit. Returns True if capacity grew."""
            nonlocal pass_cfg, step
            tile_over = int(metrics['raster_overflow'])
            glob_over = int(metrics['raster_overflow_global'])
            grew = False
            if tile_over > 0:
                if pass_cfg.raster_K >= 4096:
                    logger.error('raster_K at cap 4096 yet %d triangles '
                                 'dropped from the fullest tile at pass%d '
                                 'iter=%d; continuing with clipped '
                                 'rasterization', tile_over, pass_idx, it)
                else:
                    need = pass_cfg.raster_K + tile_over
                    newK = pass_cfg.raster_K
                    while newK < need:
                        newK *= 2
                    newK = min(newK, 4096)
                    logger.warning('raster tile overflow %d at pass%d '
                                   'iter=%d: raster_K %d -> %d (re-jit)',
                                   tile_over, pass_idx, it,
                                   pass_cfg.raster_K, newK)
                    pass_cfg = dataclasses.replace(pass_cfg, raster_K=newK)
                    grew = True
            if glob_over > 0:
                if pass_cfg.raster_Kg >= 1024:
                    logger.error('raster_Kg at cap 1024 yet %d big triangles '
                                 'dropped at pass%d iter=%d; continuing with '
                                 'clipped rasterization', glob_over,
                                 pass_idx, it)
                else:
                    need = pass_cfg.raster_Kg + glob_over
                    newKg = pass_cfg.raster_Kg
                    while newKg < need:
                        newKg *= 2
                    newKg = min(newKg, 1024)
                    logger.warning('raster global-list overflow %d at pass%d '
                                   'iter=%d: raster_Kg %d -> %d (re-jit)',
                                   glob_over, pass_idx, it,
                                   pass_cfg.raster_Kg, newKg)
                    pass_cfg = dataclasses.replace(pass_cfg, raster_Kg=newKg)
                    grew = True
            live_over = int(metrics.get('raster_overflow_live', 0))
            if live_over > 0:
                # hard cap below 2^24: the Pallas z-test carries compacted
                # face ids as f32 lanes (exact only to 2^24); rasterize
                # also skips compaction entirely once live_cap >= F, so
                # unbounded growth is never needed (advisor round 3).
                cap = 2 ** 23
                cur = pass_cfg.raster_live
                if cur >= cap:
                    logger.error('raster_live at cap %d yet %d live faces '
                                 'dropped at pass%d iter=%d; continuing '
                                 'with clipped rasterization', cap,
                                 live_over, pass_idx, it)
                else:
                    new_live = cur
                    while new_live < cur + live_over:
                        new_live *= 2
                    new_live = min(new_live, cap)
                    logger.warning('live-face compaction overflow %d at '
                                   'pass%d iter=%d: raster_live %d -> %d '
                                   '(re-jit)', live_over, pass_idx, it,
                                   cur, new_live)
                    pass_cfg = dataclasses.replace(pass_cfg,
                                                   raster_live=new_live)
                    grew = True
            shade_over = int(metrics.get('shade_overflow', 0))
            if shade_over > 0:
                H, W = pass_cfg.train_res
                cur = (H * W // 4 if pass_cfg.shade_cap < 0
                       else pass_cfg.shade_cap)
                # ceiling H*W: the compact path then holds every pixel, so
                # overflow is structurally impossible (count <= H*W).
                # max(cur, 1): the doubling loop must not spin on cur == 0
                # (possible if a tiny train_res makes H*W//4 == 0)
                new_cap = max(cur, 1)
                while new_cap < cur + shade_over:
                    new_cap *= 2
                new_cap = min(new_cap, H * W)
                logger.warning('shading-compaction overflow %d at pass%d '
                               'iter=%d: shade_cap %d -> %d (re-jit)',
                               shade_over, pass_idx, it, cur, new_cap)
                pass_cfg = dataclasses.replace(pass_cfg, shade_cap=new_cap)
                grew = True
            aa_over = int(metrics.get('aa_overflow', 0))
            if aa_over > 0:
                B = pass_cfg.batch
                H, W = pass_cfg.train_res
                cur = pass_cfg.aa_budget or B * (H + W) * 8
                new_budget = cur * 2
                while new_budget < cur + aa_over:
                    new_budget *= 2
                logger.warning('AA silhouette-pair overflow %d at pass%d '
                               'iter=%d: aa_budget %d -> %d (re-jit)',
                               aa_over, pass_idx, it, cur, new_budget)
                pass_cfg = dataclasses.replace(pass_cfg,
                                               aa_budget=new_budget)
                grew = True
            if grew:
                step, _, _, _ = make_fit_step(fitter, pass_cfg, renderer,
                                              mat_module, pass_idx,
                                              init_v_pos, mesh_edges)
            return grew

        it = 0
        # (pre-step snapshot, metrics) of the previously dispatched step.
        # Overflow counters are read one step LATE, after the next step has
        # been dispatched — by then the producing step has retired, so the
        # int() conversions never block async dispatch (round-2 advisor).
        # Capacity growth is a rare startup event; on detection we roll back
        # to the snapshot and redo, so no kept iteration trained clipped —
        # except when a capacity has hit its hard cap, where the clipped
        # iteration is kept and an error is logged.
        pending = None
        while True:
            if it >= cfg.iter:
                if pending is not None and grow_capacity(pending[1],
                                                         it - 1):
                    (state, mat_params, light_base, opt_geo, opt_mat,
                     opt_lgt, key, it) = pending[0]
                    pending = None
                    continue
                break
            saved = (state, mat_params, light_base, opt_geo, opt_mat,
                     opt_lgt, key, it)
            key, k_t, k_s = jax.random.split(key, 3)
            target = renderer.random_target(cfg.batch, np_rng, k_t)
            new = step(state, mat_params, light_base, opt_geo, opt_mat,
                       opt_lgt, target, jnp.asarray(it, jnp.float32), k_s)
            if pending is not None and grow_capacity(pending[1], it - 1):
                (state, mat_params, light_base, opt_geo, opt_mat, opt_lgt,
                 key, it) = pending[0]
                pending = None
                continue
            prev = pending
            (state, mat_params, light_base, opt_geo, opt_mat, opt_lgt,
             metrics) = new
            pending = (saved, metrics)
            # log the PREVIOUS step's metrics: grow_capacity already forced
            # them to the host, so float() here is free; logging the fresh
            # ones would sync the just-dispatched step (round-3 advisor)
            if prev is not None and (it - 1) % cfg.log_interval == 0:
                logger.info('pass%d iter=%5d img=%.6f reg=%.6f', pass_idx,
                            it - 1, float(prev[1]['img_loss']),
                            float(prev[1]['reg_loss']))
            it += 1
        return state, mat_params, light_base

    # ---- pass 1
    state, mat_params, light_base = run_pass(fitter, state, mat_params,
                                             light_base0, pass_idx=0)
    m1 = fitter.get_mesh(state)
    vert_mask = np.asarray(m1.valid_vert_idx).astype(np.float32)[:, None]
    pre_path = os.path.join(out_dir, f'tets_pre/dmt_dict_{global_index:05d}')
    _save_dmt_dict(pre_path, {
        'sdf': np.asarray(state.sdf),
        'sdf_ema': np.asarray(state.sdf_ema),
        'deform': np.asarray(state.deform) * vert_mask,
        'deform_unmasked': np.asarray(state.deform),
    })

    # ---- pass 2: frozen topology, deform rescaled (fit_dmtets.py:761-777)
    fitter2 = FixedTopoFitter(grid=grid, scale=cfg.mesh_scale,
                              deform_scale=cfg.second_stage_deform,
                              laplace_scale=cfg.laplace_scale,
                              total_iter=cfg.iter)
    state2 = fitter2.freeze(state.replace(
        deform=state.deform * cfg.first_stage_deform / cfg.second_stage_deform))
    m_init = fitter2.get_mesh(state2)
    init_v_pos = jax.lax.stop_gradient(m_init.v_pos)
    # pass-2 topology is frozen, so the crossing-edge set is static: filter
    # the mt-vertex adjacency to edges whose endpoints both exist (host-side,
    # once per mesh)
    occ = np.asarray(state2.sdf) > 0
    ue = grid.unique_edges
    crossing = occ[ue[:, 0]] ^ occ[ue[:, 1]]
    adj = np.asarray(_mt_vertex_edges(grid))
    valid = crossing[adj[:, 0]] & crossing[adj[:, 1]]
    mesh_edges = jnp.asarray(adj[valid])

    state2, mat_params, light_base = run_pass(fitter2, state2, mat_params,
                                              light_base, pass_idx=1,
                                              init_v_pos=init_v_pos,
                                              mesh_edges=mesh_edges)
    if light_base is not None:
        # keep the optimized light for any post-pass validation/bake
        envlight.base = light_base
        envlight.build_mips()

    m2 = fitter2.get_mesh(state2)
    vert_mask2 = np.asarray(m2.valid_vert_idx).astype(np.float32)[:, None]
    out_path = os.path.join(out_dir, f'tets/dmt_dict_{global_index:05d}')
    _save_dmt_dict(out_path, {
        'sdf': np.asarray(state2.sdf),
        'deform': np.asarray(state2.deform) * vert_mask2,
        'deform_unmasked': np.asarray(state2.deform),
    })

    if cfg.validate:
        # PSNR/MSE validation renders (reference fit_dmtets.py:795-796)
        from .validate import validate as run_validate
        run_validate(fitter2, state2, renderer,
                     os.path.join(out_dir,
                                  f'val_viz/dmtet_validate_{global_index}'),
                     num_views=cfg.validate_views, raster_K=cfg.raster_K)

    paths = {'tets_pre': pre_path, 'tets': out_path}
    if cfg.save_baked and mat_module is not None:
        # UV-unwrap + bake the learned MLP material to a textured OBJ
        # (reference eval.py:96-128 xatlas_uvmap + obj export)
        from .export import export_baked
        # host-compact the padded fit mesh (masked faces out, verts renumbered)
        fv = np.asarray(m2.v_pos)
        ff = np.asarray(m2.t_pos_idx)[np.asarray(m2.face_mask)]
        used = np.zeros(len(fv), bool)
        used[ff.reshape(-1)] = True
        remap = np.cumsum(used) - 1
        m_host = mesh_mod.Mesh(
            v_pos=jnp.asarray(fv[used]),
            t_pos_idx=jnp.asarray(remap[ff].astype(np.int32)))
        m_host = mesh_mod.auto_normals(m_host)
        baked_dir = os.path.join(out_dir, f'baked/{global_index:05d}')
        paths['baked'] = export_baked(
            m_host, BoundTexture3D(mat_module, mat_params), baked_dir)
    return paths


def _mt_vertex_edges(grid: TetGrid) -> jnp.ndarray:
    """Adjacency between marching-tets vertices (one per unique tet edge):
    two mt-verts are connected when their tet edges co-occur in a tet.
    Static, precomputed on host."""
    t2e = grid.tet_edge_to_unique                      # (T, 6)
    pairs = []
    for i in range(6):
        for j in range(i + 1, 6):
            pairs.append(np.stack([t2e[:, i], t2e[:, j]], axis=1))
    e = np.concatenate(pairs, axis=0)
    e = np.sort(e, axis=1)
    e = np.unique(e, axis=0)
    return jnp.asarray(e.astype(np.int32))


def _save_dmt_dict(path: str, d: Dict[str, np.ndarray]) -> str:
    try:
        import torch
        torch.save({k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)).copy()) for k, v in d.items()},
                   path + '.pt')
        return path + '.pt'
    except ImportError:
        np.savez(path + '.npz', **d)
        return path + '.npz'


def main(argv=None):
    import argparse
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser('fit_dmtets')
    p.add_argument('--config', type=str, default=None, help='json config')
    p.add_argument('--meta-path', type=str, required=True,
                   help='json list of mesh paths (ShapeNetDataset)')
    p.add_argument('-o', '--out-dir', type=str, default='./out')
    p.add_argument('-i', '--iter', type=int, default=5000)
    p.add_argument('-b', '--batch', type=int, default=4)
    p.add_argument('-ind', '--index', type=int, default=0)
    p.add_argument('-ss', '--split-size', type=int, default=1)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    cfg = FitConfig(iter=args.iter, batch=args.batch)
    if args.config:
        with open(args.config) as f:
            for k, v in json.load(f).items():
                if hasattr(cfg, k):
                    setattr(cfg, k, tuple(v) if isinstance(v, list) else v)

    with open(args.meta_path) as f:
        mesh_list = json.load(f)

    for k in range(args.split_size):
        gi = k + args.index * args.split_size
        done = os.path.join(args.out_dir, f'tets/dmt_dict_{gi:05d}.pt')
        if os.path.exists(done) or os.path.exists(done.replace('.pt', '.npz')):
            continue
        if gi >= len(mesh_list):
            break
        try:
            logger.info('fitting mesh %d: %s', gi, mesh_list[gi])
            fit_one_mesh(mesh_list[gi], cfg, args.out_dir, gi, seed=args.seed)
            logger.info('============ %d/%d finished ============', k,
                        args.split_size)
        except Exception:
            logger.error('============ %d/%d failed ============\n%s', k,
                         args.split_size, traceback.format_exc())
            continue


if __name__ == '__main__':
    main()
