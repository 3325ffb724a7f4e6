"""Child program for the 2-process CPU multi-host test (not a test file).

Runs a tiny training job as one process of a multi-process launch; the
parent (tests/test_multihost.py) sets MESHDIFFUSION_* env vars and compares
the final losses printed by each process.
"""

import os
import sys


def main():
    # each process provides 4 virtual CPU devices -> 8 global
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=4').strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from meshdiffusion_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize(), 'MESHDIFFUSION_* env not set?'
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.diffusion.trainer import train

    tmp = sys.argv[1]
    R = 8
    cfg = get_config('res64')
    cfg.data.image_size = R
    cfg.data.meta_path = os.path.join(tmp, 'meta.json')
    cfg.data.filter_meta_path = ''
    cfg.data.grid_mask_path = os.path.join(tmp, 'mask.npy')
    cfg.data.num_workers = 1
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = ()
    cfg.model.num_scales = 10
    cfg.model.beta_max = 2.0
    cfg.model.dropout = 0.0
    cfg.training.batch_size = 8          # global; 4 per process
    cfg.training.iter_size = 1
    cfg.training.log_freq = 1
    cfg.training.snapshot_freq = 1000
    cfg.training.snapshot_freq_for_preemption = 1000
    cfg.training.train_dir = os.path.join(tmp, 'run')
    cfg.optim.lr = 1e-3
    cfg.optim.warmup = 0
    cfg.tpu.compute_dtype = 'float32'
    cfg.tpu.mesh_spatial_axis = 2        # (4, 2) mesh across 2 processes

    state = train(cfg, max_steps=3)
    # params are replicated: every process can read them; equality across
    # processes is implied by SPMD, the parent checks the printed digest
    import numpy as np
    leaves = jax.tree.leaves(state.params)
    digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    print(f'MULTIHOST_OK process={jax.process_index()} step={int(state.step)} '
          f'digest={digest:.6e}', flush=True)


if __name__ == '__main__':
    main()
