"""Microbenchmarks: conv lowering variants, Pallas vs XLA ops, U-Net fwd.

Counterpart of the reference's ``renderutils/tests/test_perf.py`` (python vs
CUDA timing loops) for the TPU stack. Run on the real chip:

    python benchmarks/microbench.py [conv|ops|fwd]

Timing methodology matters on the tunneled axon platform (see
.claude/skills/verify/SKILL.md): block_until_ready does not synchronize, so
every measurement chains the op N times inside one jit and forces a scalar
transfer; identical repeated calls get memoized by the tunnel.
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timed_chain(fn, x, n=20, **consts):
    """Time n chained applications with a data dependency + scalar sync."""
    def g(x):
        def body(h, _):
            return fn(h, **consts), None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(h.astype(jnp.float32))

    f = jax.jit(g)
    float(f(x))  # compile + warm
    t0 = time.perf_counter()
    float(f(x))
    return (time.perf_counter() - t0) / n


def bench_conv():
    """3D conv lowering variants (why models/layers.py uses conv2d)."""
    B, D, C, O = 4, 64, 128, 128
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, D, D, D, C)).astype(np.float32)
                       .astype(jnp.bfloat16))
    k = jax.device_put((rng.standard_normal((3, 3, 3, C, O)) * 0.02)
                       .astype(np.float32).astype(jnp.bfloat16))
    flops = 2 * B * D ** 3 * 27 * C * O

    def native(h, k):
        y = jax.lax.conv_general_dilated(
            h, k, (1, 1, 1), 'SAME',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)[..., :C]

    def merged2d(h, k):
        B_, D_, H_, W_, C_ = h.shape
        z = jnp.zeros_like(h[:, :1])
        xm = jnp.concatenate([jnp.concatenate([z, h[:, :-1]], 1), h,
                              jnp.concatenate([h[:, 1:], z], 1)], axis=-1)
        km = k.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * C_, -1)
        y = jax.lax.conv_general_dilated(
            xm.reshape(B_ * D_, H_, W_, 3 * C_), km, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        return y.reshape(B_, D_, H_, W_, -1).astype(jnp.bfloat16)[..., :C]

    for name, fn in (('native3d', native), ('merged2d', merged2d)):
        dt = timed_chain(fn, x, n=20, k=k)
        print(f'conv {name}: {dt * 1000:.2f} ms  {flops / dt / 1e12:.0f} TFLOP/s')


def bench_ops():
    """Pallas kernels vs their XLA-fused oracles."""
    from meshdiffusion_tpu.ops import (ancestral_update,
                                       ancestral_update_reference,
                                       fused_groupnorm_silu,
                                       groupnorm_silu_reference)
    rng = np.random.default_rng(0)
    shape = (4, 64, 64, 64, 128)
    x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
    m = jax.device_put((rng.random((1, 64, 64, 64, 1)) > 0.3)
                       .astype(np.float32))
    sc = jax.device_put(rng.standard_normal(128).astype(np.float32))
    bi = jax.device_put(rng.standard_normal(128).astype(np.float32))
    beta = jnp.asarray(0.01)
    std = jnp.asarray(0.9)

    def anc_pallas(h):
        return ancestral_update(h, h * 0.1, m, h * 0.01, beta, std)[0]

    def anc_xla(h):
        return ancestral_update_reference(h, h * 0.1, m, h * 0.01, beta, std)[0]

    def gn_pallas(h):
        return fused_groupnorm_silu(h, sc, bi)

    def gn_xla(h):
        return groupnorm_silu_reference(h, sc, bi)

    for name, fn in (('ancestral pallas', anc_pallas),
                     ('ancestral xla', anc_xla),
                     ('groupnorm pallas', gn_pallas),
                     ('groupnorm xla', gn_xla)):
        dt = timed_chain(fn, x, n=20)
        print(f'{name}: {dt * 1000:.2f} ms')


def bench_fwd():
    """Full res64 U-Net forward."""
    from meshdiffusion_tpu.config import get_config
    from meshdiffusion_tpu.models import create_model
    R = 64
    cfg = get_config('res64')
    model = create_model(cfg)
    mask = jnp.ones((1, R, R, R, 1), jnp.float32)
    x0 = jnp.zeros((1, R, R, R, 4))
    shapes = jax.eval_shape(lambda: model.init(
        {'params': jax.random.key(0)}, x0, jnp.zeros((1,)), mask))
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jax.device_put((rng.standard_normal(s.shape) * 0.02)
                                 .astype(s.dtype)), shapes)
    for B in (1, 4):
        x = jax.device_put(rng.standard_normal((B, R, R, R, 4))
                           .astype(np.float32))
        lb = jnp.full((B,), 500.0)

        def fwd(h):
            return model.apply(params, h, lb, mask, train=False) * 0.999

        dt = timed_chain(fwd, x, n=8)
        print(f'unet fwd batch {B}: {dt * 1000:.0f} ms '
              f'({dt / B * 1000:.0f} ms/sample)')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('conv', 'all'):
        bench_conv()
    if which in ('ops', 'all'):
        bench_ops()
    if which in ('fwd', 'all'):
        bench_fwd()
