"""Trainer integration test: overfit a tiny model on synthetic grids across
the 8-device virtual mesh, with preemption checkpoint resume."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def train_config(tmp_path):
    from meshdiffusion_tpu.config import get_config
    rng = np.random.default_rng(0)
    paths = []
    R = 8
    for i in range(8):
        g = rng.normal(size=(4, R, R, R)).astype(np.float32)
        g[0] = np.sign(g[0])
        p = tmp_path / f'grid_{i:05d}.npy'
        np.save(p, g)
        paths.append(str(p))
    meta = tmp_path / 'meta.json'
    meta.write_text(json.dumps(paths))
    mask = np.ones((R, R, R), np.float32)
    np.save(tmp_path / 'mask.npy', mask)

    cfg = get_config('res64')
    cfg.data.image_size = R
    cfg.data.meta_path = str(meta)
    cfg.data.filter_meta_path = ""
    cfg.data.grid_mask_path = str(tmp_path / 'mask.npy')
    cfg.data.num_workers = 2
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (4,)
    cfg.model.num_scales = 10
    cfg.model.beta_max = 2.0
    cfg.model.dropout = 0.0
    cfg.training.batch_size = 4
    cfg.training.iter_size = 1
    cfg.training.log_freq = 2
    cfg.training.snapshot_freq = 100
    cfg.training.snapshot_freq_for_preemption = 4
    cfg.training.train_dir = str(tmp_path / 'run')
    cfg.optim.lr = 1e-3
    cfg.optim.warmup = 0
    cfg.tpu.compute_dtype = 'float32'
    cfg.tpu.mesh_data_axis = -1
    cfg.tpu.mesh_spatial_axis = 2
    return cfg


def test_train_and_resume(train_config):
    from meshdiffusion_tpu.diffusion.trainer import train
    state = train(train_config, max_steps=6)
    assert int(state.step) == 7  # steps 0..6 inclusive

    # preemption checkpoint written at step 4
    meta_dir = os.path.join(train_config.training.train_dir, 'checkpoints-meta')
    assert os.path.isdir(meta_dir)

    # resume: starts from the preemption checkpoint step
    state2 = train(train_config, max_steps=8)
    assert int(state2.step) == 9

    # metrics were logged
    metrics_path = os.path.join(train_config.training.train_dir, 'metrics.jsonl')
    lines = [json.loads(l) for l in open(metrics_path)]
    assert any(l['tag'] == 'training_loss' for l in lines)
    assert all(np.isfinite(l['value']) for l in lines)


def test_indivisible_batch_errors(train_config):
    """batch not divisible by the data axis is a hard error (no silent
    device idling) unless tpu.allow_device_idle opts in."""
    import pytest
    from meshdiffusion_tpu.diffusion.trainer import train
    train_config.training.batch_size = 3   # data axis is 4 on the 8-dev mesh
    with pytest.raises(ValueError, match='not divisible'):
        train(train_config, max_steps=1)
    train_config.tpu.allow_device_idle = True
    state = train(train_config, max_steps=1)
    assert int(state.step) == 2
