"""The full conditional-generation chain: single-view visibility dict ->
load_partial_grids -> conditional sampler; plus CLI override parsing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_singleview_dict_feeds_cond_gen(tmp_path, tiny_tet_grid, monkeypatch):
    """A {sdf, vis} dict in the reference format conditions sampling:
    visible-region SDF values survive into the output grid region."""
    import torch
    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.diffusion import evaler as E

    tg = tiny_tet_grid
    R = tg.resolution
    monkeypatch.setattr(E.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))
    import meshdiffusion_tpu.diffusion.trainer as T
    monkeypatch.setattr(T.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))

    # synthetic single-view output in the reference dmtet.pt format
    rng = np.random.default_rng(0)
    sdf = np.sign(0.3 - np.linalg.norm(tg.verts, axis=1)).astype(np.float32)
    sdf[sdf == 0] = 1.0
    vis = (tg.verts[:, 2] > 0).astype(np.float32)  # front half visible
    torch.save({'sdf': torch.from_numpy(sdf.copy()),
                'deform': torch.zeros(tg.num_verts, 3),
                'vis': torch.from_numpy(vis.copy()),
                'vis_rast': torch.from_numpy(vis.copy().astype(bool))},
               tmp_path / 'dmtet.pt')

    cfg = get_config('res64')
    cfg.data.image_size = R
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (4,)
    cfg.model.num_scales = 8
    cfg.model.beta_max = 2.0
    cfg.model.dropout = 0.0
    cfg.eval.batch_size = 1
    cfg.eval.ckpt_path = ""
    cfg.eval.eval_dir = str(tmp_path / 'out')
    cfg.eval.partial_dmtet_path = str(tmp_path / 'dmtet.pt')
    cfg.eval.tet_path = ""
    cfg.eval.freeze_iters = 7
    cfg.tpu.compute_dtype = 'float32'

    path = E.cond_gen(cfg, save_fname='cc')
    out = np.load(path)   # (1, 4, R, R, R)
    assert out.shape == (1, 4, R, R, R)
    assert np.isfinite(out).all()
    # inside the visible mask the SDF channel carries the partial's sign
    # structure more often than chance (freeze ran until step N-2)
    c = tg.vert_grid_coords
    vis_idx = vis > 0
    got = out[0, 0, c[vis_idx, 0], c[vis_idx, 1], c[vis_idx, 2]]
    agree = (np.sign(got) == sdf[vis_idx]).mean()
    assert agree > 0.6, agree


def test_cli_override_parsing():
    from meshdiffusion_tpu.main import _apply_overrides, _load_config
    cfg = _load_config('res64')
    cfg = _apply_overrides(cfg, [
        ('optim.lr', '0.5'),
        ('training.batch_size', '7'),
        ('sampling.noise_removal', 'false'),
        ('model.ch_mult', '(1,2,4)'),
        ('eval.ckpt_path', '/x/y.pth'),
    ])
    assert cfg.optim.lr == 0.5
    assert cfg.training.batch_size == 7
    assert cfg.sampling.noise_removal is False
    assert cfg.model.ch_mult == (1, 2, 4)
    assert cfg.eval.ckpt_path == '/x/y.pth'
