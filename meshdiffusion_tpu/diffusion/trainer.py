"""Training pipeline (counterpart of reference lib/diffusion/trainer.py:18-130).

TPU-first differences from the reference:

* ONE jitted train step consumes a (iter_size, micro_bs, R, R, R, 4) batch,
  with gradient accumulation fused inside (losses.make_train_step);
* data parallelism via a ('data', 'spatial') jax.sharding.Mesh — batches
  sharded over 'data', parameters replicated, XLA psums the gradients —
  instead of torch DataParallel;
* preemption resume + numbered snapshots via orbax instead of torch pickles;
* the grid mask is derived from the bundled tet grid when no file is given
  (the reference loads a pre-baked grid_mask_{R}.pt, trainer.py:59).
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import ShapeNetDMTetDataset, GridLoader
from ..geometry.tet_grid import TetGrid
from ..models import create_model
from ..parallel import make_mesh, replicate
from ..utils.checkpoint import save_checkpoint, restore_checkpoint
from . import losses as L
from .vpsde import VPSDE

logger = logging.getLogger(__name__)


def load_grid_mask(config) -> np.ndarray:
    """(R, R, R) float32 occupancy mask."""
    R = config.data.image_size
    path = config.data.get('grid_mask_path', '')
    if path:
        if path.endswith('.npy'):
            m = np.load(path)
        else:
            import torch
            m = torch.load(path, map_location='cpu').numpy()
        return np.asarray(m, np.float32).reshape(R, R, R)
    tet_root = config.tpu.tet_root or None
    return TetGrid.load(R, tet_root).grid_mask()


class MetricWriter:
    """Scalar logger: JSONL always, plus TensorBoard events when available
    (reference trainer.py:32-33 writes TB summaries)."""

    def __init__(self, workdir: str):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, 'metrics.jsonl')
        self._fh = open(self.path, 'a')
        self._tb = None
        try:
            from torch.utils import tensorboard
            self._tb = tensorboard.SummaryWriter(
                os.path.join(workdir, 'tensorboard'))
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int):
        import json
        self._fh.write(json.dumps({'tag': tag, 'value': float(value),
                                   'step': int(step), 'time': time.time()}) + "\n")
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def train(config, max_steps: int | None = None):
    """Run the training loop. Returns the final TrainState.

    Multi-host: launch one process per host with MESHDIFFUSION_COORDINATOR/
    NUM_PROCESSES/PROCESS_ID set (parallel/distributed.py); each process
    feeds its local slice of the global batch, XLA psums gradients over
    ICI+DCN, and orbax coordinates checkpoint I/O."""
    from ..parallel.distributed import (form_global_batch, maybe_initialize,
                                        process_local_batch_size)
    maybe_initialize()
    is_main = jax.process_index() == 0

    workdir = config.training.train_dir
    logger.info("working dir: %s", workdir)
    writer = MetricWriter(workdir) if is_main else None

    R = config.data.image_size
    mask_host = load_grid_mask(config)                       # (R, R, R)
    mask = jnp.asarray(mask_host)[None, ..., None]           # (1, R, R, R, 1)

    spatial = config.tpu.mesh_spatial_axis
    n_dev = len(jax.devices())
    data_axis = config.tpu.mesh_data_axis
    if data_axis == -1:
        data_axis = n_dev // spatial
    # the data axis must divide the per-step batch; a silent shrink would
    # quietly idle devices (e.g. batch 50 on 8 chips -> 2 used), so this is
    # an error unless explicitly opted into via tpu.allow_device_idle
    bs = config.training.batch_size
    if bs % data_axis != 0:
        if not config.tpu.get('allow_device_idle', False):
            raise ValueError(
                f'training.batch_size={bs} is not divisible by the data mesh '
                f'axis ({data_axis} = {n_dev} devices / spatial {spatial}); '
                f'pick a divisible batch, set tpu.mesh_data_axis, or set '
                f'tpu.allow_device_idle=True to shrink the mesh')
        while data_axis > 1 and bs % data_axis != 0:
            data_axis -= 1
        logger.warning('mesh uses %d of %d devices (batch %d not divisible)',
                       data_axis * spatial, n_dev, bs)
    mesh = make_mesh(data_axis, spatial,
                     devices=jax.devices()[:data_axis * spatial])
    # batches carry a leading iter_size axis -> B is axis 1, grid-D is axis 2
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sharding = NamedSharding(
        mesh, P(None, 'data',
                'spatial' if mesh.shape['spatial'] > 1 else None))
    rep = replicate(mesh)

    model = create_model(config)
    sde = VPSDE(beta_min=config.model.beta_min, beta_max=config.model.beta_max,
                N=config.model.num_scales)
    tx = L.get_optimizer(config)

    rng = jax.random.key(config.seed)
    rng, init_rng, state_rng = jax.random.split(rng, 3)
    x0 = jnp.zeros((1, R, R, R, config.data.num_channels))

    # jit-init with replicated out_shardings: every process runs the same
    # deterministic program, so the result is a valid GLOBAL array even in
    # multi-process launches (a host-side init + device_put could only
    # address local devices).
    def _init(init_rng, state_rng):
        params = model.init({'params': init_rng}, x0, jnp.zeros((1,)), mask)
        return L.TrainState.create(params, tx, state_rng)

    state = jax.jit(_init, out_shardings=rep)(init_rng, state_rng)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    logger.info("model %s: %.1fM params", config.model.name, n_params / 1e6)

    # preemption resume (reference trainer.py:44-52)
    ckpt_meta_dir = os.path.join(workdir, 'checkpoints-meta')
    ckpt_dir = os.path.join(workdir, 'checkpoints')
    state = restore_checkpoint(ckpt_meta_dir, state)
    initial_step = int(state.step)

    train_step = jax.jit(
        L.make_train_step(model, sde, tx, mask,
                          loss_type=config.training.loss_type,
                          ema_decay=config.model.ema_rate,
                          iter_size=config.training.iter_size),
        donate_argnums=(0,))

    # per-process data feed: each process loads 1/process_count of the
    # global batch from a DISJOINT shard of the dataset (reference DDP
    # sampler semantics: a global batch is a partition, no cross-host
    # duplicates); the shuffle seed still differs per process
    local_bs = process_local_batch_size(config.training.batch_size)
    data_seed = config.seed + 1031 * jax.process_index()
    dataset = ShapeNetDMTetDataset(
        config.data.meta_path, mask_host,
        deform_scale=config.model.deform_scale,
        aug=config.data.aug,
        filter_meta_path=(config.data.filter_meta_path
                          if config.data.filter_meta_path not in ("", "PLACEHOLDER")
                          else None),
        normalize_sdf=config.data.normalize_sdf,
        extension=config.data.extension,
        seed=data_seed)
    if jax.process_count() > 1:
        dataset.fpath_list = \
            dataset.fpath_list[jax.process_index()::jax.process_count()]
        if len(dataset.fpath_list) == 0:
            raise ValueError(
                f'dataset smaller than process count '
                f'({jax.process_count()}): no samples for process '
                f'{jax.process_index()}')
    iter_size = config.training.iter_size
    loader = None
    if config.data.extension == 'npy':
        # prefer the native C++ loader (decode+augment+batch off the GIL);
        # transparent fallback to the Python threaded loader
        try:
            from ..native import NativeGridLoader
            loader = NativeGridLoader(
                dataset.fpath_list, mask_host,
                batch_size=local_bs * iter_size,
                aug=config.data.aug,
                normalize_sdf=config.data.normalize_sdf,
                num_workers=config.data.num_workers, seed=data_seed)
            logger.info('using native C++ grid loader')
        except Exception as e:
            logger.warning('native loader unavailable (%s); using python loader', e)
    if loader is None:
        loader = GridLoader(dataset,
                            batch_size=local_bs * iter_size,
                            num_workers=config.data.num_workers,
                            seed=data_seed)

    n_iters = config.training.n_iters if max_steps is None else max_steps
    logger.info("Starting training loop at step %d.", initial_step)

    t_last = time.time()
    try:
        for step in range(initial_step, n_iters + 1):
            batch = next(loader)
            batch = batch.reshape((iter_size, local_bs) + batch.shape[1:])
            batch = form_global_batch(batch, batch_sharding)
            state, metrics = train_step(state, batch)

            if step % config.training.log_freq == 0:
                loss = float(metrics['loss'])
                dt = time.time() - t_last
                t_last = time.time()
                logger.info("step: %d, training_loss: %.5e (%.2fs/%d steps)",
                            step, loss, dt, config.training.log_freq)
                if writer is not None:
                    writer.scalar("training_loss", loss, step)

            if step != 0 and step % config.training.snapshot_freq_for_preemption == 0:
                logger.info("save meta at iter %d", step)
                save_checkpoint(ckpt_meta_dir, state, max_to_keep=1)

            if (step != 0 and step % config.training.snapshot_freq == 0
                    or step == n_iters):
                logger.info("save model: %d-th", step)
                save_checkpoint(ckpt_dir, state)
    finally:
        loader.close()
        if writer is not None:
            writer.close()
    return state
