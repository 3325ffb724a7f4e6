"""Compiler-level evidence for the batch-4 sampling pathology.

XLA dump flags are scrubbed by the remote compile helper (axon confinement),
so classic HLO dumps are unavailable through the tunnel. Instead this pulls
the compiled executable's own accounting — ``cost_analysis()`` (flops,
bytes accessed) and ``memory_analysis()`` — for the flagship res64 forward
at several batch sizes and prints per-sample ratios. Identical per-sample
flops with inflated per-sample bytes-accessed names the pathology class
(fusion/layout producing extra HBM traffic); inflated transcendentals or
flops would point at recomputation instead.

Usage: python benchmarks/batch_cost_analysis.py [--batches 1,4]
"""

import argparse
import json
import os
import sys

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batches', default='1,4')
    p.add_argument('--config', default='res64')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.models import create_model
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid

    cfg = get_config(args.config)
    R = int(cfg.data.image_size)
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

    results = []
    for b in (int(x) for x in args.batches.split(',')):
        x = jnp.zeros((b, R, R, R, 4), jnp.float32)
        labels = jnp.full((b,), 500.0, jnp.float32)
        fn = jax.jit(lambda p, x, l: model.apply(p, x, l, mask, train=False))
        compiled = fn.lower(params, x, labels).compile()
        row = {'batch': b}
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            for k in ('flops', 'bytes accessed', 'transcendentals',
                      'utilization operand 0 {}'):
                if k in ca:
                    row[k.replace(' ', '_')] = ca[k]
            row['per_sample_flops'] = ca.get('flops', 0) / b
            row['per_sample_bytes'] = ca.get('bytes accessed', 0) / b
        except Exception as e:
            row['cost_analysis_error'] = str(e)[:200]
        try:
            ma = compiled.memory_analysis()
            for k in ('temp_size_in_bytes', 'argument_size_in_bytes',
                      'output_size_in_bytes', 'generated_code_size_in_bytes'):
                v = getattr(ma, k, None)
                if v is not None:
                    row[k] = int(v)
        except Exception as e:
            row['memory_analysis_error'] = str(e)[:200]
        results.append(row)
        print(json.dumps(row), flush=True)

    if len(results) >= 2 and 'per_sample_bytes' in results[0] \
            and 'per_sample_bytes' in results[-1]:
        a, z = results[0], results[-1]
        print(json.dumps({
            'summary': 'per-sample ratios batch %d vs %d' % (z['batch'],
                                                             a['batch']),
            'flops_ratio': round(z['per_sample_flops']
                                 / max(a['per_sample_flops'], 1), 4),
            'bytes_ratio': round(z['per_sample_bytes']
                                 / max(a['per_sample_bytes'], 1), 4),
        }))


if __name__ == '__main__':
    main()
