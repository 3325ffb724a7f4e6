"""Fused GroupNorm + SiLU + 3x3x3 conv Pallas kernel.

The hot pattern of every U-Net residual block (reference layers.py:652-657:
GroupNorm(32) -> SiLU -> conv3x3x3). Round-1 measurement (BASELINE.md): a
conv-only skeleton of the res64 U-Net runs at 41 ms vs 69.7 ms for the full
step, i.e. ~40% of the step is the elementwise normalize/SiLU chain between
convs, and a STANDALONE GroupNorm kernel is a regression because it forces
an extra materialization that XLA otherwise fuses into the conv's input
read. The win requires one kernel that normalizes and convolves in a single
HBM pass — this file.

Design (TPU-first):

* GroupNorm statistics are a cheap XLA reduction (one read of x); the
  normalize+scale+bias collapses into a per-(batch, channel) affine
  ``x*a + b`` folded on the host side, so the kernel body is
  ``silu(x*a+b)`` followed by the convolution.
* The 3^3 conv is decomposed into 27 shifted (D*H, W, C)-row matmuls: the
  kernel walks (batch, depth-plane) grid steps keeping a rolling window of
  the last 3 *normalized* planes in VMEM scratch (each plane is normalized
  exactly once), and accumulates ``shift(xn, s) @ K[tap]`` over the 27 taps
  into an fp32 accumulator. Shifts are static row offsets in the flattened
  (H*W, C) plane with W-edge masks — every matmul is a dense
  (H*W, C) x (C, O) MXU op, no im2col materialization, no 3C concat
  (the conv2d lowering in models/layers.py materializes a k*C copy of every
  activation; this kernel reads each activation once).
* Backward: ``jax.custom_vjp`` recomputes through the jnp reference
  composition (XLA convs), so autodiff-driven training keeps exact
  GroupNorm gradients; sampling (the headline metric) is forward-only.

The jnp oracle ``gn_silu_conv3d_reference`` is the spec; tests assert
kernel-vs-oracle equivalence for values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm import groupnorm_silu_reference


def gn_silu_conv3d_reference(x, scale, bias, kernel, conv_bias,
                             num_groups: int = 32, eps: float = 1e-6,
                             dtype=jnp.bfloat16):
    """jnp oracle: GroupNorm(fp32 stats) -> SiLU -> SAME 3^3 conv in
    ``dtype`` (the model's compute dtype), fp32 MXU accumulation semantics
    matching models/layers.py Conv3D."""
    h = groupnorm_silu_reference(x, scale, bias, num_groups, eps)
    y = jax.lax.conv_general_dilated(
        h.astype(dtype), kernel.astype(dtype), (1, 1, 1), 'SAME',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=dtype)
    return y + conv_bias.astype(dtype)


def _gn_affine(x, scale, bias, num_groups, eps):
    """Fold GroupNorm + scale/bias into per-(B, C) affine a, b (fp32)."""
    B, C = x.shape[0], x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(B, -1, g, C // g)
    mean = xf.mean(axis=(1, 3))                       # (B, g)
    var = xf.var(axis=(1, 3))
    inv = jax.lax.rsqrt(var + eps)
    # broadcast (B, g) -> (B, C)
    inv_c = jnp.repeat(inv, C // g, axis=1)
    mean_c = jnp.repeat(mean, C // g, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None]
    b = bias.astype(jnp.float32)[None] - mean_c * a
    return a, b


def _pad_rows(W: int) -> int:
    """Leading/trailing zero rows in the padded plane scratch: at least the
    max |row shift| of a tap (W+1), rounded to the 8-row sublane tile so
    the plane write lands aligned."""
    return -(-(W + 1) // 8) * 8


def _kernel(ab_ref, k_ref, cb_ref, x_ref, out_ref, xn_ref,
            *, D, H, W, C, O, dtype):
    j = pl.program_id(1)
    HW = H * W
    pad = _pad_rows(W)

    @pl.when(j == 0)
    def _():
        xn_ref[:] = jnp.zeros_like(xn_ref)

    # Lag-2 pipeline: step j normalizes plane j (VPU) and emits output
    # plane d = j - 2 (MXU) — the two phases share no data, so Mosaic can
    # overlap vector and matrix work instead of serializing
    # normalize(j) -> matmuls(j) as a lag-1 design would.
    slot = j % 4

    @pl.when(j < D)
    def _():
        xf = x_ref[0, 0].reshape(HW, C).astype(jnp.float32)
        a = ab_ref[0, 0, 0:1, :]
        b = ab_ref[0, 0, 1:2, :]
        h = xf * a + b
        xn_ref[slot, pl.ds(pad, HW), :] = (h * jax.nn.sigmoid(h)).astype(
            xn_ref.dtype)

    @pl.when(j >= D)
    def _():
        xn_ref[slot, pl.ds(pad, HW), :] = jnp.zeros((HW, C), xn_ref.dtype)

    # Emit output plane d = j - 2 from normalized planes {d-1, d, d+1}.
    @pl.when(j >= 2)
    def _():
        # W-edge masks: a +-1 column shift in flattened rows wraps across
        # H rows; zero the wrapped rows.
        w_id = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
        m_left = (w_id != 0).astype(dtype)         # tap reads col w-1
        m_right = (w_id != (W - 1)).astype(dtype)  # tap reads col w+1

        acc = cb_ref[0:1, :] * jnp.ones((HW, 1), jnp.float32)
        for kd in range(3):
            # plane index (j-2) - 1 + kd lives in slot (j + kd + 1) % 4;
            # the low edge (plane -1) reads slot 3, untouched zeros until
            # j == 3; the high edge is zeroed by the j >= D branch above.
            s_id = (j + kd + 1) % 4
            for kh in range(3):
                for kw in range(3):
                    shift = (kh - 1) * W + (kw - 1)
                    win = xn_ref[s_id, pl.ds(pad + shift, HW), :]
                    if kw == 0:
                        win = win * m_left
                    elif kw == 2:
                        win = win * m_right
                    acc += jnp.dot(win, k_ref[kd * 9 + kh * 3 + kw],
                                   preferred_element_type=jnp.float32)
        out_ref[0, 0] = acc.astype(out_ref.dtype)


def gn_silu_conv3d_pallas(x, scale, bias, kernel, conv_bias,
                          num_groups: int = 32, eps: float = 1e-6,
                          dtype=jnp.bfloat16, interpret: bool = False):
    """Fused forward. x: (B, D, H, W, C); kernel: (3, 3, 3, C, O)."""
    B, D, H, W, C = x.shape
    O = kernel.shape[-1]
    HW = H * W
    hwp = HW + 2 * _pad_rows(W)

    a, b = _gn_affine(x, scale, bias, num_groups, eps)
    ab = jnp.stack([a, b], axis=1)[:, None]            # (B, 1, 2, C)
    k27 = kernel.reshape(27, C, O).astype(dtype)
    cb = conv_bias.astype(jnp.float32)[None]           # (1, O)
    # statistics above use the original precision; the kernel streams the
    # activation in compute dtype (halves DMA traffic + VMEM for the fp32
    # residual-sum inputs of the up path)
    x = x.astype(dtype)

    grid = (B, D + 2)
    kern = functools.partial(_kernel, D=D, H=H, W=W, C=C, O=O, dtype=dtype)
    esz = jnp.dtype(dtype).itemsize
    # VMEM: rolling normalized window (4 slots, lag-2 pipeline) +
    # double-buffered in/out blocks + fp32 accumulator + tap weights, with
    # headroom for Mosaic's own stack. Above the default 16 MB scoped
    # limit at the 64^3 shapes; v5e has far more physical VMEM.
    vmem_bytes = int(1.4 * (4 * hwp * C * esz + 2 * HW * C * esz
                            + HW * O * 4 + 2 * HW * O * esz
                            + 27 * C * O * esz + (2 * C + O) * 4))
    vmem_bytes = max(vmem_bytes, 24 * 2 ** 20)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 2, C), lambda bi, j: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, C, O), lambda bi, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda bi, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, W, C),
                         lambda bi, j: (bi, jnp.minimum(j, D - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, HW, O),
            lambda bi, j: (bi, jnp.maximum(j - 2, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, HW, O), dtype),
        scratch_shapes=[
            pltpu.VMEM((4, hwp, C), dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(ab, k27, cb, x)
    return out.reshape(B, D, H, W, O)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3d(x, scale, bias, kernel, conv_bias,
                   num_groups: int = 32, eps: float = 1e-6,
                   dtype=jnp.bfloat16):
    """GroupNorm -> SiLU -> 3^3 SAME conv, fused on TPU.

    Falls back to the jnp reference off-TPU (the Pallas interpreter is far
    slower than XLA's fused CPU code and tests run the kernel explicitly).
    """
    if jax.default_backend() != 'tpu':
        return gn_silu_conv3d_reference(x, scale, bias, kernel, conv_bias,
                                        num_groups, eps, dtype)
    return gn_silu_conv3d_pallas(x, scale, bias, kernel, conv_bias,
                                 num_groups, eps, dtype)


def _fwd(x, scale, bias, kernel, conv_bias, num_groups, eps, dtype):
    y = gn_silu_conv3d(x, scale, bias, kernel, conv_bias,
                       num_groups, eps, dtype)
    return y, (x, scale, bias, kernel, conv_bias)


def _bwd(num_groups, eps, dtype, res, g):
    # Exact gradients via the decomposed XLA composition: recompute-fwd is
    # one extra conv pass, and autodiff of GroupNorm statistics stays exact.
    x, scale, bias, kernel, conv_bias = res
    _, vjp = jax.vjp(
        lambda *a: gn_silu_conv3d_reference(*a, num_groups, eps, dtype),
        x, scale, bias, kernel, conv_bias)
    return vjp(g)


gn_silu_conv3d.defvjp(_fwd, _bwd)
