"""The full unconditional chain end to end: uncond_gen (sampler + .npy
format) -> extract_batch (marching tets + remesh + smooth + obj + viz) on a
tiny CPU config. Cond has tests/test_cond_chain.py; this is the uncond
counterpart (reference README flow: uncond_gen then eval.py extraction)."""

import os

import numpy as np


def test_uncond_gen_then_extract(tmp_path, tiny_tet_grid, monkeypatch):
    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.diffusion import evaler as E
    import meshdiffusion_tpu.diffusion.trainer as T
    import meshdiffusion_tpu.extract as X

    tg = tiny_tet_grid
    R = tg.resolution
    monkeypatch.setattr(E.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))
    monkeypatch.setattr(T.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))
    monkeypatch.setattr(X.TetGrid, 'load',
                        staticmethod(lambda res, root=None: tg))

    mask_path = str(tmp_path / 'mask.npy')
    np.save(mask_path, tg.grid_mask())

    cfg = get_config('res64')
    cfg.data.image_size = R
    cfg.data.grid_mask_path = mask_path
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (4,)
    cfg.model.num_scales = 6
    cfg.model.beta_max = 2.0
    cfg.model.dropout = 0.0
    cfg.eval.batch_size = 2
    cfg.eval.ckpt_path = ""           # random model: chain plumbing test
    cfg.eval.eval_dir = str(tmp_path / 'out')
    cfg.sampling.segment_steps = 6
    cfg.tpu.compute_dtype = 'float32'

    path = E.uncond_gen(cfg, idx=3)
    out = np.load(path)
    # reference channel-first .npy format (evaler.py:49-52)
    assert out.shape == (2, 4, R, R, R)
    assert np.isfinite(out).all()

    mesh_dir = str(tmp_path / 'meshes')
    paths = X.extract_batch(path, mesh_dir, resolution=R, mesh_scale=1.0,
                            num_smooth_steps=2, remesh=True)
    assert len(paths) == 2
    n_nonempty = 0
    for p in paths:
        assert os.path.exists(p)
        txt = open(p).read()
        nv = sum(1 for line in txt.splitlines() if line.startswith('v '))
        nf = sum(1 for line in txt.splitlines() if line.startswith('f '))
        if nf > 0:
            n_nonempty += 1
            assert nv >= 4
    # a random model on a tiny grid still produces some surface
    assert n_nonempty >= 1
