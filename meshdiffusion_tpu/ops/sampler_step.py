"""Fused DDPM ancestral-update kernel.

The per-step elementwise tail of the ancestral sampler (reference
sampling.py:222-230 + the grid-mask multiplies at :476-478):

    score  = -eps_hat / std
    x_mean = (x + beta * score) * rsqrt(1 - beta) * mask
    x      = (x_mean + sqrt(beta) * noise) * mask

As one Pallas kernel this is a single HBM round trip over four tensors with
on-chip PRNG for the noise (pltpu.prng_random_bits), instead of relying on
XLA to fuse the random-bits generation with the update. The jnp reference
implementation is the numeric spec (sampler tests run both).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ancestral_update_reference(x: jnp.ndarray, eps_hat: jnp.ndarray,
                               mask: jnp.ndarray, noise: jnp.ndarray,
                               beta: jnp.ndarray, std: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp oracle. x/eps_hat/noise: (B, ...); mask broadcastable; beta/std
    scalars."""
    score = -eps_hat / std
    x_mean = (x + beta * score) / jnp.sqrt(1.0 - beta) * mask
    x_new = (x_mean + jnp.sqrt(beta) * noise) * mask
    return x_new, x_mean


def _kernel(coef_ref, x_ref, eps_ref, mask_ref, noise_ref,
            x_out_ref, mean_out_ref):
    beta = coef_ref[0, 0]
    std = coef_ref[0, 1]
    inv_sqrt = jax.lax.rsqrt(1.0 - beta)
    sqrt_beta = jnp.sqrt(beta)
    m = mask_ref[:]
    score = -(eps_ref[:]) / std
    x_mean = (x_ref[:] + beta * score) * inv_sqrt * m
    mean_out_ref[:] = x_mean
    x_out_ref[:] = (x_mean + sqrt_beta * noise_ref[:]) * m


def ancestral_update(x: jnp.ndarray, eps_hat: jnp.ndarray, mask: jnp.ndarray,
                     noise: jnp.ndarray, beta: jnp.ndarray, std: jnp.ndarray,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas fast path. Shapes: x/eps_hat/noise (B, R, R, R, C); mask
    broadcastable to x; beta/std scalars (traced ok)."""
    interpret = interpret or jax.default_backend() == 'cpu'
    orig_shape = x.shape
    C = orig_shape[-1]
    n = int(np.prod(orig_shape[:-1]))
    # row-block the flattened volume; lanes = channels padded to 128
    x2 = x.reshape(n, C)
    e2 = eps_hat.reshape(n, C)
    m2 = jnp.broadcast_to(mask, orig_shape).reshape(n, C)
    n2 = noise.reshape(n, C)
    coef = jnp.stack([beta.astype(jnp.float32),
                      std.astype(jnp.float32)]).reshape(1, 2)

    BLOCK = 2048
    grid = (pl.cdiv(n, BLOCK),)
    specs = pl.BlockSpec((BLOCK, C), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, C), x.dtype)
    x_new, x_mean = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  specs, specs, specs, specs],
        out_specs=(specs, specs),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(coef, x2, e2, m2, n2)
    return x_new.reshape(orig_shape), x_mean.reshape(orig_shape)
