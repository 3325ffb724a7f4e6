"""Fused GroupNorm(32) + SiLU Pallas kernel.

The normalization used at every U-Net residual block (reference
layers.py:652,660: GroupNorm(num_groups=32, eps=1e-6) followed by SiLU).
Two-phase single-kernel design: the grid walks row blocks of the flattened
volume twice (phase 0 accumulates per-group sums/squares into VMEM scratch,
phase 1 normalizes + applies scale/bias + SiLU), so the activation makes
exactly two HBM reads and one write, with fp32 statistics regardless of the
compute dtype. The jnp oracle is the spec.

Limitations (asserted): channels divisible by num_groups; channels padded
to the 128-lane width by the caller's layout (C=128/256/512 in this model).
Statistics are per (batch-sample, group) — the kernel processes one batch
sample per grid step along axis 0.
"""

from __future__ import annotations

import functools
from typing import Optional
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def groupnorm_silu_reference(x: jnp.ndarray, scale: jnp.ndarray,
                             bias: jnp.ndarray, num_groups: int = 32,
                             eps: float = 1e-6) -> jnp.ndarray:
    """jnp oracle: channels-last GroupNorm + SiLU, fp32 statistics."""
    B = x.shape[0]
    C = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(B, -1, g, C // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h.reshape(B, -1, C) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return (jax.nn.silu(h)).reshape(x.shape).astype(x.dtype)


def _kernel(sb_ref, x_ref, out_ref, acc_ref, *, num_groups, eps, rows_total,
            block):
    phase = pl.program_id(1)
    i = pl.program_id(2)
    C = x_ref.shape[-1]
    gw = C // num_groups

    @pl.when((phase == 0) & (i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # row-validity mask for the tail block
    row0 = i * block
    rid = jax.lax.broadcasted_iota(jnp.int32, (block, C), 0) + row0
    valid = (rid < rows_total).astype(jnp.float32)

    xb = x_ref[0].astype(jnp.float32) * valid

    # constant one-hot group matrix (C, g): channel c belongs to group c//gw
    # — per-group reductions become matmuls (Mosaic disallows lane reshapes)
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    onehot = (ch // gw == gr).astype(jnp.float32)       # (C, g)

    @pl.when(phase == 0)
    def _():
        col = jnp.sum(xb, axis=0, keepdims=True)        # (1, C)
        col2 = jnp.sum(xb * xb, axis=0, keepdims=True)
        acc_ref[0:1, :] += jnp.dot(col, onehot,
                                   preferred_element_type=jnp.float32)
        acc_ref[1:2, :] += jnp.dot(col2, onehot,
                                   preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _():
        cnt = jnp.float32(rows_total * gw)
        mean = acc_ref[0:1, :] / cnt                    # (1, g)
        var = acc_ref[1:2, :] / cnt - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        # expand (1, g) -> (1, C) via the transposed one-hot
        mean_c = jnp.dot(mean, onehot.T,
                         preferred_element_type=jnp.float32)
        inv_c = jnp.dot(inv, onehot.T,
                        preferred_element_type=jnp.float32)
        sc = sb_ref[0:1, :]
        bi = sb_ref[1:2, :]
        h = (x_ref[0].astype(jnp.float32) - mean_c) * inv_c * sc + bi
        out_ref[0] = (h * jax.nn.sigmoid(h)).astype(out_ref.dtype)


def fused_groupnorm_silu(x: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, num_groups: int = 32,
                         eps: float = 1e-6, block: Optional[int] = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Pallas fast path. x: (B, ..., C) channels-last. ``block`` (rows per
    grid step) defaults to a VMEM-safe size inversely proportional to C."""
    interpret = interpret or jax.default_backend() == 'cpu'
    B = x.shape[0]
    C = x.shape[-1]
    assert C % num_groups == 0
    if block is None:
        # ~1MB fp32 per buffered block; Mosaic needs sublane multiples of 8
        block = max(256, ((1 << 18) // C) // 8 * 8)
    rows = int(np.prod(x.shape[1:-1]))
    xr = x.reshape(B, rows, C)
    nblk = pl.cdiv(rows, block)
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    kernel = functools.partial(_kernel, num_groups=num_groups, eps=eps,
                               rows_total=rows, block=block)
    out = pl.pallas_call(
        kernel,
        grid=(B, 2, nblk),
        in_specs=[
            pl.BlockSpec((2, C), lambda b, p, i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, block, C), lambda b, p, i: (b, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, C), lambda b, p, i: (b, i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        interpret=interpret,
    )(sb, xr)
    return out.reshape(x.shape)
