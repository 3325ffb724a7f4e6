"""res128 in-sampler decomposition: why is a sampler step slower than the
bare forward?

Round-3 verdict: 974.9 ms/U-Net step inside the sampler vs 443 ms bare
forward (BASELINE.md) — an unexplained 2.2x. This times, on the chip, with
identical segment mechanics:

  a) bare forward (one jitted model apply, timed over n dispatches);
  b) a length-L scan whose body is ONLY the model call (scan mechanics);
  c) the real ancestral predictor scan body WITHOUT the model (x-update
     elementwise math + per-step jax.random.normal + mask);
  d) the full sampler segment (model + update);
  e) jax.random.normal alone at the sample shape (threefry cost).

Prints one JSON line. Usage: python benchmarks/res128_profile.py
[--config res128] [--steps 10] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='res128')
    p.add_argument('--steps', type=int, default=10)   # scan length L
    p.add_argument('--reps', type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.models import create_model
    from meshdiffusion_tpu.diffusion.vpsde import VPSDE
    from meshdiffusion_tpu.diffusion import sampling as S
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid

    cfg = get_config(args.config)
    R = int(cfg.data.image_size)
    L = args.steps

    tg = TetGrid.load(R)
    mask = jnp.asarray(tg.grid_mask())[None, ..., None]
    model = create_model(cfg)
    x0 = jnp.zeros((1, R, R, R, 4))
    shapes = jax.eval_shape(
        lambda: model.init({'params': jax.random.key(0)}, x0,
                           jnp.zeros((1,)), mask))
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put(
            (host.standard_normal(s.shape) * 0.02).astype(s.dtype)), shapes)

    sde = VPSDE(N=cfg.model.num_scales)
    tables = S.StepTables.build(sde, 1e-3)
    rows = jax.device_put(tables.stacked())
    shape = (1, R, R, R, 4)
    x_init = jax.device_put(
        host.standard_normal(shape).astype(np.float32))

    def model_fn(p, x, labels):
        return model.apply(p, x, labels, mask, train=False)

    def sync(v):
        np.asarray(jax.tree.leaves(v)[0]).ravel()[:1]

    def timeit(fn, *a):
        out = fn(*a)            # compile + warm
        sync(out)
        best = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(out)
            best.append(time.perf_counter() - t0)
        return min(best)

    # a) bare forward
    fwd = jax.jit(lambda p, x: model_fn(p, x, jnp.full((1,), 500.0)))
    t_fwd = timeit(fwd, params, x_init)

    # b) scan of L model calls only
    def scan_model(p, x):
        def body(c, i):
            lab = jnp.full((1,), i.astype(jnp.float32))
            return model_fn(p, c, lab), None
        return jax.lax.scan(body, x, jnp.arange(L))[0]
    t_scan_model = timeit(jax.jit(scan_model), params, x_init)

    # c) sampler body without the model: ancestral x-update + noise + mask
    def row_at(i):
        return jax.tree.map(lambda t: t[i], rows)

    def scan_update(x, key):
        def body(carry, i):
            x, key = carry
            key = jax.random.fold_in(key, i)
            row = row_at(i)
            eps_hat = x * 0.99  # stand-in for the net output (free)
            x_mean = (x - row['beta'] / row['std'] * eps_hat) \
                / jnp.sqrt(1.0 - row['beta'])
            noise = jax.random.normal(key, x.shape, dtype=x.dtype)
            x = (x_mean + jnp.sqrt(row['beta']) * noise) * mask
            return (x, key), None
        return jax.lax.scan(body, (x, key), jnp.arange(L))[0][0]
    t_scan_update = timeit(jax.jit(scan_update), x_init, jax.random.key(0))

    # d) the real sampler segment (one compiled L-step segment)
    cfg.sampling.segment_steps = L
    cfg.model.num_scales = sde.N
    sampler = S.get_pc_sampler(
        sde=sde, shape=shape, predictor=cfg.sampling.predictor,
        corrector=cfg.sampling.corrector, snr=cfg.sampling.snr,
        n_steps=cfg.sampling.n_steps_each,
        probability_flow=cfg.sampling.probability_flow,
        denoise=False, eps=1e-3, grid_mask=mask, segment_steps=L)
    # time the FULL run then normalize per step (includes segment dispatch)
    def run_sampler():
        out, _ = sampler(model_fn, jax.random.key(1), params=params)
        return out
    out = run_sampler(); sync(out)
    t0 = time.perf_counter()
    out = run_sampler(); sync(out)
    t_sampler_total = time.perf_counter() - t0

    # e) noise generation alone
    t_noise = timeit(
        jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32)),
        jax.random.key(2))

    N = sde.N
    result = {
        'metric': f'{args.config}_step_decomposition',
        'R': R, 'scan_len': L, 'num_scales': N,
        'bare_forward_ms': round(t_fwd * 1000, 1),
        'scan_model_only_ms_per_step': round(t_scan_model / L * 1000, 1),
        'scan_update_only_ms_per_step': round(t_scan_update / L * 1000, 2),
        'full_sampler_ms_per_step': round(t_sampler_total / N * 1000, 1),
        'noise_alone_ms': round(t_noise * 1000, 2),
        'device': str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
