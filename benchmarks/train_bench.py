"""Training-throughput benchmark: the jitted res64 train step on one chip.

The reference's dominant workload is 2.4M train iterations at batch 48
(reference configs/res64.py:14, hot loop lib/diffusion/trainer.py:94-116);
this times our fused train step (grad + adam + EMA, losses.make_train_step)
at the flagship res64 shapes and prints one JSON line with ms/step,
steps/s, and the projected days for the reference's 2.4M iterations.

Usage:  python benchmarks/train_bench.py [--batch 48] [--iter-size 1]
                                         [--steps 20] [--dtype bfloat16]
Batch sweeps: TRAIN_BENCH_BATCHES="8,16,32,48" runs several micro-batch
sizes in one process (compiles are persistent-cached).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(batch: int, iter_size: int, steps: int, compute_dtype: str):
    import jax
    import jax.numpy as jnp
    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.models import create_model
    from meshdiffusion_tpu.diffusion import losses as L
    from meshdiffusion_tpu.diffusion.vpsde import VPSDE
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid

    cfg = get_config('res64')
    cfg.tpu.compute_dtype = compute_dtype
    R = int(cfg.data.image_size)
    tg = TetGrid.load(R)
    mask = jnp.asarray(tg.grid_mask())[None, ..., None]

    model = create_model(cfg)
    sde = VPSDE(beta_min=cfg.model.beta_min, beta_max=cfg.model.beta_max,
                N=cfg.model.num_scales)
    tx = L.get_optimizer(cfg)

    x0 = jnp.zeros((1, R, R, R, 4))
    shapes = jax.eval_shape(
        lambda: model.init({'params': jax.random.key(0)}, x0,
                           jnp.zeros((1,)), mask))
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put(
            (host.standard_normal(s.shape) * 0.02).astype(s.dtype)), shapes)
    state = L.TrainState.create(params, tx, jax.random.key(0))

    train_step = jax.jit(
        L.make_train_step(model, sde, tx, mask, loss_type=cfg.training.loss_type,
                          ema_decay=cfg.model.ema_rate,
                          iter_size=iter_size),
        donate_argnums=(0,))

    data = host.standard_normal(
        (iter_size, batch, R, R, R, 4)).astype(np.float32)
    batch_dev = jax.device_put(data)

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch_dev)
    loss0 = float(metrics['loss'])          # forces the compile + first run
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, batch_dev)
    loss1 = float(metrics['loss'])          # host sync through the tunnel
    dt = time.perf_counter() - t0

    ms_per_step = dt / steps * 1000.0
    eff_batch = batch * iter_size
    return {
        'micro_batch': batch,
        'iter_size': iter_size,
        'effective_batch': eff_batch,
        'compute_dtype': compute_dtype,
        'ms_per_step': round(ms_per_step, 2),
        'ms_per_sample': round(ms_per_step / eff_batch, 3),
        'steps_per_s': round(1000.0 / ms_per_step, 3),
        'days_for_2p4M_iters': round(2.4e6 * ms_per_step / 1000 / 86400, 2),
        'compile_s': round(compile_s, 1),
        'loss_finite': bool(np.isfinite(loss0) and np.isfinite(loss1)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=48)
    p.add_argument('--iter-size', type=int, default=1)
    p.add_argument('--steps', type=int, default=20)
    p.add_argument('--dtype', default='bfloat16')
    args = p.parse_args()

    batches = os.environ.get('TRAIN_BENCH_BATCHES')
    batches = ([int(b) for b in batches.split(',')] if batches
               else [args.batch])
    results = []
    for b in batches:
        try:
            r = bench_one(b, args.iter_size, args.steps, args.dtype)
        except Exception as e:  # OOM at large batch is a result, not a crash
            msg = f'{type(e).__name__}: {e}'
            # keep the TAIL: compile-helper logs put the real error last
            r = {'micro_batch': b, 'error': msg[-4000:]}
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


if __name__ == '__main__':
    main()
