"""Full-scale converter proof: reference res64 checkpoint -> flax, eps parity.

Round-1 converter tests ran at R=16 only; this script exercises the REAL
364M-parameter res64 architecture end to end (VERDICT item 5):

1. build the reference torch DDPMRes64 (imported read-only from
   /root/reference, CPU) at full size with a fixed seed,
2. save a reference-format checkpoint ({model: module.*, ema, step}) exactly
   like the released .pth files (reference lib/diffusion/trainer.py save
   format, README.md:35-37),
3. load it through utils.torch_convert.load_torch_checkpoint,
4. compare torch vs flax eps-predictions on a fixed noise grid with the real
   bundled 64^3 tet mask at several diffusion timesteps.

Run:  python tools/fullscale_parity.py  (CPU, ~10-20 min; writes
PARITY_FULLSCALE.md at the repo root).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

REFERENCE = '/root/reference'
R = 64


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    import torch

    torch.manual_seed(0)
    from meshdiffusion_tpu.config import get_config
    cfg = get_config('res64')
    cfg.model.dropout = 0.0
    cfg.tpu.compute_dtype = 'float32'      # parity check is exact-math
    cfg.tpu.fused_gn_silu_conv = False

    sys.path.insert(0, REFERENCE)
    try:
        from lib.diffusion.models.ddpm_res64 import DDPMRes64
        from lib.diffusion.models.ema import ExponentialMovingAverage
    finally:
        sys.path.remove(REFERENCE)

    t0 = time.time()
    tmodel = DDPMRes64(cfg)
    tmodel.eval()
    n_params = sum(p.numel() for p in tmodel.parameters())
    print(f'torch model built: {n_params/1e6:.1f}M params '
          f'({time.time()-t0:.0f}s)', flush=True)

    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    mask = TetGrid.load(64).grid_mask()[None, None]          # (1,1,R,R,R)

    ema = ExponentialMovingAverage(tmodel.parameters(), decay=0.999)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.requires_grad:
                p.add_(torch.randn_like(p) * 0.005)
    ema.update(tmodel.parameters())

    ckpt_path = '/tmp/fullscale_ckpt.pth'
    torch.save({'model': {f'module.{k}': v
                          for k, v in tmodel.state_dict().items()},
                'ema': ema.state_dict(), 'optimizer': None, 'step': 777},
               ckpt_path)
    print(f'checkpoint saved ({os.path.getsize(ckpt_path)/2**30:.2f} GiB)',
          flush=True)

    from meshdiffusion_tpu.models import create_model
    from meshdiffusion_tpu.diffusion import losses as L
    from meshdiffusion_tpu.utils.torch_convert import load_torch_checkpoint

    jmodel = create_model(cfg)
    x0 = jnp.zeros((1, R, R, R, 4))
    maskj = jnp.asarray(np.moveaxis(mask[0:1], 1, -1))
    params = jax.eval_shape(
        lambda: jmodel.init({'params': jax.random.key(0)}, x0,
                            jnp.zeros((1,)), maskj))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    tx = L.get_optimizer(cfg)
    state = L.TrainState.create(params, tx, jax.random.key(0))
    t0 = time.time()
    state = load_torch_checkpoint(ckpt_path, cfg, state)
    print(f'converted ({time.time()-t0:.0f}s); step={int(state.step)}',
          flush=True)
    assert int(state.step) == 777

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 4, R, R, R)).astype(np.float32)
    lines = []
    for t_label in (3.0, 250.0, 500.0, 999.0):
        labels = np.array([t_label], np.float32)
        t0 = time.time()
        with torch.no_grad():
            tmodel.mask.data[:] = torch.from_numpy(mask)
            t_out = tmodel(torch.from_numpy(x),
                           torch.from_numpy(labels)).numpy()
        t_torch = time.time() - t0

        t0 = time.time()
        xj = jnp.asarray(np.moveaxis(x, 1, -1))
        j_out = jmodel.apply(state.params, xj, jnp.asarray(labels), maskj,
                             train=False)
        j_out = np.moveaxis(np.asarray(j_out), -1, 1)
        t_jax = time.time() - t0

        diff = np.abs(j_out - t_out)
        denom = np.maximum(np.abs(t_out), 1e-3)
        line = (f't={t_label:6.1f}: max_abs={diff.max():.3e} '
                f'mean_abs={diff.mean():.3e} '
                f'max_rel@|eps|>1e-3={np.max(diff/denom):.3e} '
                f'(torch {t_torch:.0f}s, jax {t_jax:.0f}s)')
        print(line, flush=True)
        lines.append(line)
        assert diff.max() < 5e-4, f'full-scale parity FAILED at t={t_label}'

    # EMA tree differs from raw params (the converter maps the flat EMA
    # shadow list back by parameter order)
    ema_leaf = jax.tree.leaves(state.ema_params)[0]
    raw_leaf = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(ema_leaf), np.asarray(raw_leaf))

    with open(os.path.join(os.path.dirname(__file__), '..',
                           'PARITY_FULLSCALE.md'), 'w') as f:
        f.write('# Full-scale converter parity (res64, 364M params)\n\n'
                'Generated by `tools/fullscale_parity.py`: reference torch '
                'DDPMRes64 (seeded full-size weights, reference checkpoint '
                'format incl. DataParallel prefix + EMA) -> '
                '`utils/torch_convert.py` -> flax; eps-prediction '
                'comparison on a fixed noise grid with the bundled 64^3 '
                'tet mask (CPU, fp32).\n\n```\n'
                + '\n'.join(lines) + '\n```\n\n'
                'Pass criterion: max abs diff < 5e-4 at every timestep.\n')
    print('PARITY_FULLSCALE.md written', flush=True)


if __name__ == '__main__':
    main()
