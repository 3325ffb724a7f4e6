"""Validation loop, DDIM interp path, extract viz PNG — remaining surfaces."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _sphere_fit_setup(tiny_tet_grid):
    from meshdiffusion_tpu.fitting.geometry import DMTetFitter
    from meshdiffusion_tpu.fitting.dataset import TargetRenderer
    from meshdiffusion_tpu.fitting.fit import default_material
    from meshdiffusion_tpu.geometry.marching_tets import marching_tets, compact_mesh
    from meshdiffusion_tpu.render import mesh as M
    from meshdiffusion_tpu.render.light import EnvironmentLight

    tg = tiny_tet_grid
    sdf = 0.3 - np.linalg.norm(tg.verts, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    ref = M.auto_normals(M.Mesh(v_pos=jnp.asarray(v),
                                t_pos_idx=jnp.asarray(f.astype(np.int32)),
                                material=default_material()))
    light = EnvironmentLight(jnp.ones((6, 16, 16, 3)))
    light.build_mips()
    renderer = TargetRenderer(ref_mesh=ref, envlight=light, cam_radius=2.0,
                              train_res=(48, 48), display_res=(48, 48),
                              num_surface_samples=500)
    fitter = DMTetFitter(grid=tg, scale=1.0, deform_scale=1.0, total_iter=10)
    state = fitter.init_state(jax.random.key(0))
    # a "perfectly fitted" state: the GT sdf itself
    state = state.replace(sdf=jnp.asarray(sdf))
    return fitter, state, renderer


def test_validate_metrics(tmp_path, tiny_tet_grid):
    from meshdiffusion_tpu.fitting.validate import validate
    fitter, state, renderer = _sphere_fit_setup(tiny_tet_grid)
    psnr = validate(fitter, state, renderer, str(tmp_path / 'val'),
                    num_views=3, save_images=True, raster_K=64)
    # geometry == GT geometry -> near-perfect renders
    assert psnr > 30
    lines = open(tmp_path / 'val' / 'metrics.txt').read().splitlines()
    assert lines[0] == 'ID, MSE, PSNR'
    assert lines[-1].startswith('AVERAGES')
    assert os.path.exists(tmp_path / 'val' / 'val_000000_opt.png')


def test_validate_detects_bad_fit(tmp_path, tiny_tet_grid):
    from meshdiffusion_tpu.fitting.validate import validate
    fitter, state, renderer = _sphere_fit_setup(tiny_tet_grid)
    bad = state.replace(sdf=state.sdf - 0.15)  # shrunken sphere
    psnr_bad = validate(fitter, bad, renderer, str(tmp_path / 'valbad'),
                        num_views=2, save_images=False, raster_K=64)
    psnr_good = validate(fitter, state, renderer, str(tmp_path / 'valgood'),
                         num_views=2, save_images=False, raster_K=64)
    assert psnr_good > psnr_bad + 5


def test_uncond_gen_interp_cli(tmp_path, monkeypatch):
    """DDIM slerp-interp generation end-to-end with a tiny model."""
    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.diffusion.evaler import uncond_gen_interp

    np.save(tmp_path / 'mask.npy', np.ones((8, 8, 8), np.float32))
    cfg = get_config('res64')
    cfg.data.image_size = 8
    cfg.data.grid_mask_path = str(tmp_path / 'mask.npy')
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (4,)
    cfg.model.num_scales = 6
    cfg.model.beta_max = 2.0
    cfg.model.dropout = 0.0
    cfg.eval.batch_size = 4
    cfg.eval.ckpt_path = ""
    cfg.eval.eval_dir = str(tmp_path / 'out')
    cfg.tpu.compute_dtype = 'float32'
    path = uncond_gen_interp(cfg, idx='interp')
    arr = np.load(path)
    assert arr.shape == (4, 4, 8, 8, 8)
    assert np.isfinite(arr).all()
    # endpoints differ (distinct noises), interior interpolates
    assert np.abs(arr[0] - arr[-1]).max() > 0


def test_extract_save_viz(tmp_path, monkeypatch, tiny_tet_grid):
    from meshdiffusion_tpu import extract as E
    monkeypatch.setattr(E.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tiny_tet_grid))
    tg = tiny_tet_grid
    sdf = 0.3 - np.linalg.norm(tg.verts, axis=1).astype(np.float32)
    grid = np.zeros((4, tg.resolution,) * 1 + (tg.resolution, tg.resolution),
                    np.float32)
    grid = np.zeros((4, tg.resolution, tg.resolution, tg.resolution), np.float32)
    c = tg.vert_grid_coords
    grid[0, c[:, 0], c[:, 1], c[:, 2]] = sdf
    np.save(tmp_path / 'samples.npy', grid[None])
    paths = E.extract_batch(str(tmp_path / 'samples.npy'),
                            str(tmp_path / 'out'),
                            resolution=tg.resolution, mesh_scale=1.0,
                            num_smooth_steps=1, save_viz=True, angle_ind=5)
    assert os.path.exists(paths[0])
    viz = os.path.join(tmp_path, 'out', 'viz', 'viz_000000.png')
    assert os.path.exists(viz)
    from meshdiffusion_tpu.render.utils import load_image
    img = load_image(viz)
    assert img.shape[2] == 3 and img.max() > 0
