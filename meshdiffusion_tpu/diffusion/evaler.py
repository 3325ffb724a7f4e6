"""Generation drivers: uncond_gen / cond_gen / uncond_gen_interp.

Counterpart of reference ``lib/diffusion/evaler.py`` (uncond_gen:14-60,
slerp+interp:63-131, cond_gen:134-212). Outputs are saved in the reference's
file format — channel-FIRST ``(B, 4, R, R, R)`` ``.npy`` — so downstream
tooling (including the reference's own eval.py) can consume them unchanged.

Known reference bug not replicated: ``uncond_gen_interp`` references
undefined ``batch_size``/``x`` (reference evaler.py:126-127); ours implements
the intended slerp chain.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.tet_grid import TetGrid
from ..models import create_model
from ..utils.checkpoint import restore_checkpoint
from . import losses as L
from . import sampling
from .trainer import load_grid_mask
from .vpsde import VPSDE

logger = logging.getLogger(__name__)


def _setup(config, use_ema: bool = True):
    """Build model/state, restore checkpoint, return bound eval model_fn."""
    R = config.data.image_size
    mask_host = load_grid_mask(config)
    mask = jnp.asarray(mask_host)[None, ..., None]

    model = create_model(config)
    sde = VPSDE(beta_min=config.model.beta_min, beta_max=config.model.beta_max,
                N=config.model.num_scales)

    rng = jax.random.key(config.seed)
    x0 = jnp.zeros((1, R, R, R, config.data.num_channels))
    params = model.init({'params': rng}, x0, jnp.zeros((1,)), mask)
    tx = L.get_optimizer(config)
    state = L.TrainState.create(params, tx, rng)

    ckpt_path = config.eval.ckpt_path
    if ckpt_path and ckpt_path != "PLACEHOLDER":
        if ckpt_path.endswith(('.pth', '.pt')):
            # released PyTorch checkpoint -> convert
            from ..utils.torch_convert import load_torch_checkpoint
            state = load_torch_checkpoint(ckpt_path, config, state)
        else:
            state = restore_checkpoint(ckpt_path, state)
        logger.info("loaded model trained till iter %d",
                    int(state.step) // config.training.iter_size)
    else:
        logger.warning("eval.ckpt_path unset; sampling from a random model")

    # EMA weights for sampling (reference evaler.py:52)
    eval_params = state.ema_params if use_ema else state.params

    def model_fn(p, x, labels):
        return model.apply(p, x, labels, mask, train=False)

    return model_fn, eval_params, sde, mask, mask_host, state


def _save(samples: jnp.ndarray, eval_dir: str, fname: str) -> str:
    os.makedirs(eval_dir, exist_ok=True)
    path = os.path.join(eval_dir, f"{fname}.npy")
    # channels-last device layout -> reference channel-first file layout
    arr = np.moveaxis(np.asarray(samples), -1, 1)
    np.save(path, arr)
    return path


def uncond_gen(config, idx=0, seed: Optional[int] = None,
               return_traj: bool = False):
    """Unconditional generation (reference evaler.py:14-60). With
    ``return_traj``, saves the x0-prediction trajectory snapshots (steps
    >=700 every 10, reference sampling.py:480-481) as separate .npy files
    for eval_traj-style extraction."""
    model_fn, eval_params, sde, mask, _, _ = _setup(config)
    R = config.data.image_size
    shape = (config.eval.batch_size, R, R, R, config.data.num_channels)
    sampler = sampling.get_sampling_fn(config, sde, shape, eps=1e-3,
                                       grid_mask=mask,
                                       return_traj=return_traj)
    key = jax.random.key(config.seed if seed is None else seed)
    samples, n = sampler(model_fn, key, params=eval_params)
    if return_traj:
        paths = []
        for t in range(samples.shape[0]):
            paths.append(_save(samples[t], config.eval.eval_dir,
                               f"{idx}_time{t:03d}"))
        logger.info("saved %d trajectory snapshots (nfe=%d)", len(paths), n)
        return paths
    path = _save(samples, config.eval.eval_dir, str(idx))
    logger.info("saved %s (nfe=%d)", path, n)
    return path


def slerp(z1, z2, alpha):
    """Spherical linear interpolation (reference evaler.py:63-71)."""
    theta = jnp.arccos(jnp.sum(z1 * z2)
                       / (jnp.linalg.norm(z1) * jnp.linalg.norm(z2)))
    return (jnp.sin((1 - alpha) * theta) / jnp.sin(theta) * z1
            + jnp.sin(alpha * theta) / jnp.sin(theta) * z2)


def uncond_gen_interp(config, idx=0, seed: Optional[int] = None):
    """DDIM generation from slerp-interpolated prior noise
    (reference evaler.py:73-131, with its undefined-variable bug fixed)."""
    model_fn, eval_params, sde, mask, _, _ = _setup(config)
    R = config.data.image_size
    B = config.eval.batch_size
    shape = (B, R, R, R, config.data.num_channels)
    sampler = sampling.get_ddim_sampler(sde, shape,
                                        denoise=config.sampling.noise_removal,
                                        grid_mask=mask)
    key = jax.random.key(config.seed if seed is None else seed)
    noise = jax.random.normal(key, (2,) + shape[1:])
    x0 = jnp.zeros(shape)
    x0 = x0.at[0].set(noise[0]).at[-1].set(noise[1])
    for i in range(1, B - 1):
        x0 = x0.at[i].set(slerp(noise[0], noise[1], i / float(B - 1)))
    samples, n = sampler(model_fn, key, x0=x0, params=eval_params)
    path = _save(samples, config.eval.eval_dir, str(idx))
    logger.info("saved %s (nfe=%d)", path, n)
    return path


def load_partial_grids(config):
    """partial_dmtet dict {sdf, vis} -> (partial_sdf, partial_mask) grids of
    shape (1, R, R, R, 1) (reference evaler.py:181-201)."""
    R = config.data.image_size
    path = config.eval.partial_dmtet_path
    if path.endswith('.npz'):
        d = np.load(path)
        partial_sdf = np.asarray(d['sdf'], np.float32)
        partial_vis = np.asarray(d['vis'], np.float32)
    else:
        import torch
        d = torch.load(path, map_location='cpu')
        partial_sdf = d['sdf'].float().numpy()
        partial_vis = d['vis'].float().numpy()

    tet_path = config.eval.tet_path
    if tet_path and tet_path != "PLACEHOLDER":
        tet = np.load(tet_path)
        verts = np.asarray(tet['vertices'])
        u = np.unique(verts)
        dx = u[1] - u[0]
        coords = np.round((verts - verts.min()) / dx).astype(np.int64)
    else:
        tg = TetGrid.load(R, config.tpu.tet_root or None)
        coords = tg.vert_grid_coords

    sdf_grid = np.zeros((1, R, R, R, 1), np.float32)
    mask_grid = np.zeros((1, R, R, R, 1), np.float32)
    sdf_grid[0, coords[:, 0], coords[:, 1], coords[:, 2], 0] = partial_sdf
    mask_grid[0, coords[:, 0], coords[:, 1], coords[:, 2], 0] = partial_vis
    return jnp.asarray(sdf_grid), jnp.asarray(mask_grid)


def cond_gen(config, save_fname='0', seed: Optional[int] = None):
    """Single-view conditional generation (reference evaler.py:134-212)."""
    model_fn, eval_params, sde, mask, _, _ = _setup(config)
    R = config.data.image_size
    shape = (config.eval.batch_size, R, R, R, config.data.num_channels)
    sampler = sampling.get_sampling_fn(config, sde, shape, eps=1e-3,
                                       grid_mask=mask)
    partial, partial_mask = load_partial_grids(config)
    key = jax.random.key(config.seed if seed is None else seed)
    samples, n = sampler(model_fn, key, partial=partial,
                         partial_mask=partial_mask,
                         freeze_iters=config.eval.freeze_iters,
                         params=eval_params)
    path = _save(samples, config.eval.eval_dir, save_fname)
    logger.info("saved %s (nfe=%d)", path, n)
    return path
