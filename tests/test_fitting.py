"""End-to-end fitting smoke test: fit a tiny GT sphere mesh for a few
iterations through the full two-pass pipeline (CPU-sized)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_fit_one_mesh_two_passes(tmp_path, tiny_tet_grid, monkeypatch):
    import jax
    import jax.numpy as jnp
    from meshdiffusion_tpu.fitting import fit as F
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    from meshdiffusion_tpu.geometry.marching_tets import marching_tets, compact_mesh
    from meshdiffusion_tpu.geometry.obj_io import write_obj

    # GT mesh: a sphere extracted from the tiny grid itself
    tg = tiny_tet_grid
    sdf = 0.3 - np.linalg.norm(tg.verts, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    obj_path = tmp_path / 'sphere.obj'
    write_obj(str(obj_path), v, f)

    monkeypatch.setattr(F.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))

    cfg = F.FitConfig(iter=3, batch=1, train_res=(64, 64),
                      dmtet_grid=tg.resolution, mesh_scale=1.0,
                      surface_samples=1000, raster_K=64,
                      normal_only=True, learn_light=True, cam_radius=2.0)

    paths = F.fit_one_mesh(str(obj_path), cfg, str(tmp_path / 'out'), 0,
                           seed=0)
    for k, p in paths.items():
        assert os.path.exists(p + '.pt') or os.path.exists(p + '.npz') or \
            os.path.exists(p), p

    # outputs load and have the right shapes
    d = F.load_saved(paths['tets']) if hasattr(F, 'load_saved') else None
    import torch
    saved = torch.load(paths['tets'] + '.pt') if os.path.exists(
        paths['tets'] + '.pt') else None
    if saved is None:
        saved = dict(np.load(paths['tets'] + '.npz'))
        saved = {k: np.asarray(v) for k, v in saved.items()}
    else:
        saved = {k: v.numpy() for k, v in saved.items()}
    assert saved['sdf'].shape == (tg.num_verts,)
    assert saved['deform'].shape == (tg.num_verts, 3)
    assert set(np.unique(np.sign(saved['sdf']))) <= {-1.0, 1.0}
    assert np.isfinite(saved['deform']).all()


@pytest.mark.slow
def test_fit_with_mlp_material(tmp_path, tiny_tet_grid, monkeypatch):
    """normal_only=False: the hash-grid MLP kd_ks_normal material is LIVE in
    the fit step (reference fit_dmtets.py:713-716) — its params must update
    and the /8 encoder-gradient rescale must be effective."""
    import jax
    import jax.numpy as jnp
    from meshdiffusion_tpu.fitting import fit as F
    from meshdiffusion_tpu.fitting.dataset import TargetRenderer
    from meshdiffusion_tpu.fitting.geometry import DMTetFitter
    from meshdiffusion_tpu.geometry.marching_tets import (marching_tets,
                                                          compact_mesh)
    from meshdiffusion_tpu.geometry.obj_io import write_obj
    from meshdiffusion_tpu.render import light as light_mod
    from meshdiffusion_tpu.render import mesh as mesh_mod

    tg = tiny_tet_grid
    sdf = 0.3 - np.linalg.norm(tg.verts, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    obj_path = tmp_path / 'sphere.obj'
    write_obj(str(obj_path), np.asarray(v), np.asarray(f))

    ref = F.obj_mod.load_mesh(str(obj_path))
    lo, hi = mesh_mod.aabb(ref.v_pos)
    ref = mesh_mod.center_by_reference(ref, (np.asarray(lo), np.asarray(hi)),
                                       1.0)
    ref = mesh_mod.auto_normals(ref)
    ref.material = F.default_material()
    env = light_mod.create_trainable_env_rnd(64, scale=0.0, bias=0.5)
    env.build_mips()

    cfg = F.FitConfig(iter=3, batch=1, train_res=(48, 48),
                      dmtet_grid=tg.resolution, mesh_scale=1.0,
                      surface_samples=500, raster_K=512,
                      normal_only=False, learn_light=False, cam_radius=2.0)
    renderer = TargetRenderer(ref_mesh=ref, envlight=env, cam_radius=2.0,
                              train_res=(48, 48), num_surface_samples=500)
    fitter = DMTetFitter(grid=tg, scale=1.0, deform_scale=2.0,
                         sdf_regularizer=0.2, total_iter=cfg.iter,
                         buffer_capacity=50)
    state = fitter.init_state(jax.random.key(1))
    aabb = (np.asarray(lo), np.asarray(hi))
    mat_module, mat_params = F.make_mlp_material(aabb)
    p0 = jax.tree.map(np.asarray, mat_params)

    step, tx_geo, tx_mat, _ = F.make_fit_step(fitter, cfg, renderer,
                                              mat_module, 0)
    opt_geo = tx_geo.init({'sdf': state.sdf, 'deform': state.deform})
    opt_mat = tx_mat.init(mat_params)
    key = jax.random.key(0)
    np_rng = np.random.default_rng(0)
    for it in range(cfg.iter):
        key, k_t, k_s = jax.random.split(key, 3)
        target = renderer.random_target(1, np_rng, k_t)
        state, mat_params, _, opt_geo, opt_mat, _, metrics = step(
            state, mat_params, None, opt_geo, opt_mat, None, target,
            jnp.asarray(it, jnp.float32), k_s)
        assert np.isfinite(float(metrics['img_loss']))
    p1 = jax.tree.map(np.asarray, mat_params)

    # every material leaf moved (encoder grid AND mlp head are live)
    moved = jax.tree_util.tree_map_with_path(
        lambda path, a, b: (jax.tree_util.keystr(path),
                            bool(np.any(a != b))), p0, p1)
    flat = jax.tree.leaves(moved, is_leaf=lambda x: isinstance(x, tuple))
    assert all(m for _, m in flat), [n for n, m in flat if not m]

    # the /8 encoder rescale: exactly the encoder leaves are scaled
    fake = jax.tree.map(jnp.ones_like, mat_params)
    scaled = F.rescale_encoder_grads(fake)
    pairs = jax.tree_util.tree_flatten_with_path(scaled)[0]
    assert pairs
    saw_enc = saw_other = False
    for path, leaf in pairs:
        name = jax.tree_util.keystr(path)
        val = float(np.asarray(leaf).ravel()[0])
        if 'encoder' in name:
            saw_enc = True
            assert val == 0.125, (name, val)
        else:
            saw_other = True
            assert val == 1.0, (name, val)
    assert saw_enc and saw_other
