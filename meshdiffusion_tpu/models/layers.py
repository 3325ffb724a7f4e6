"""3D U-Net building blocks, channels-last, flax.linen.

Behavioral counterparts of the reference blocks in
``lib/diffusion/models/layers.py`` (ResnetBlockDDPM:646-689, AttnBlock:585-608,
Upsample:611-623, Downsample:626-643, get_timestep_embedding:542-556, NIN:573),
re-designed for TPU:

* all activations are NDHWC — XLA's preferred conv layout on TPU;
* attention is a plain (B, S, C) dot-product softmax over the flattened
  volume (S = D*H*W, 4096 at 16 cubed), hitting the MXU as two batched
  matmuls instead of the reference's 7-D einsum;
* convs/matmuls may run in bfloat16 (``dtype``) with fp32 parameters and
  fp32 GroupNorm statistics.

Initializers reproduce the DDPM ``variance_scaling(1., 'fan_avg', 'uniform')``
scheme (reference layers.py:54-91) so training-from-scratch matches.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def ddpm_init(scale: float = 1.0):
    """variance_scaling(scale, fan_avg, uniform); scale 0 -> 1e-10 (zero-init)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, 'fan_avg', 'uniform')


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           max_positions: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding of (possibly fractional) timestep labels.

    Matches reference layers.py:542-556: freq = exp(-log(1e4) * i/(half-1)).
    """
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = np.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class NIN(nn.Module):
    """1x1 'network-in-network' layer over the channel axis."""
    num_units: int
    init_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w = self.param('W', ddpm_init(self.init_scale), (in_dim, self.num_units))
        b = self.param('b', nn.initializers.zeros, (self.num_units,))
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        return y + b


class Conv3D(nn.Module):
    """NDHWC 3D conv with DDPM init and optional compute dtype.

    ``impl='conv2d'`` (default) lowers the k*k*k conv to ONE 2D k*k conv on
    (B*D, H, W, k*C): the depth-kernel taps become channel groups gathered by
    shifting the input along D. On TPU this avoids XLA's 3D-convolution
    layout assignments, which interleave batch into the middle of the shape
    and surround every conv with transposes (measured 3.6x faster end-to-end
    on the res64 U-Net than rank-3 conv_general_dilated, single v5e chip).
    Parameters remain in the canonical (kd, kh, kw, I, O) layout so
    checkpoints are implementation-independent.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = 'SAME'
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32
    impl: str = 'conv2d'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.impl == 'native' or self.stride != 1 or self.padding != 'SAME':
            return nn.Conv(
                features=self.features,
                kernel_size=(self.kernel,) * 3,
                strides=(self.stride,) * 3,
                padding=self.padding,
                kernel_init=ddpm_init(self.init_scale),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name='conv')(x)
        return _Conv3DAs2D(features=self.features, kernel=self.kernel,
                           init_scale=self.init_scale, dtype=self.dtype,
                           name='conv')(x)


class _Conv3DAs2D(nn.Module):
    """SAME-padded stride-1 k^3 conv as one 2D conv on (B*D, H, W, k*C).

    Params are named 'kernel'/'bias' with the canonical (k, k, k, I, O)
    kernel layout — identical tree paths and shapes to nn.Conv, so
    checkpoints are interchangeable between implementations.
    """
    features: int
    kernel: int = 3
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel
        B, D, H, W, C = x.shape
        w = self.param('kernel', ddpm_init(self.init_scale),
                       (k, k, k, C, self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        import os
        variant = os.environ.get('MESHDIFFUSION_CONV_IMPL', 'sum3')
        half = k // 2
        if variant == 'sum3':
            # DEFAULT: k 2D convs on the raw (B*D, H, W, C) volume, outputs
            # added with D-shifts: skips materializing the (B, D, H, W, k*C)
            # tap concat (one extra read+write of k*C channels per conv) at
            # the cost of k MXU calls with k-fold smaller contraction depth.
            # Measured in the full res64 sampler step (round 3, v5e):
            # 48.4 ms/step vs 64.9 taps at batch 1; 68.1 vs 88.5 ms/sample
            # at batch 4.
            x2 = x.reshape(B * D, H, W, C)
            y = None
            for kd in range(k):
                yk = jax.lax.conv_general_dilated(
                    x2, w[kd].astype(self.dtype), (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=self.dtype)
                yk = yk.reshape(B, D, H, W, self.features)
                off = kd - half
                # y[d] += conv2d(x)[d + off], zeros beyond the D range
                if off > 0:
                    yk = jnp.concatenate(
                        [yk[:, off:], jnp.zeros_like(yk[:, :off])], axis=1)
                elif off < 0:
                    yk = jnp.concatenate(
                        [jnp.zeros_like(yk[:, off:]), yk[:, :off]], axis=1)
                y = yk if y is None else y + yk
            return y + b.astype(self.dtype)
        # 'taps' variant: gather the k depth taps as channel groups
        # (B, D, H, W, k*C) feeding ONE 2D conv
        taps = []
        for kd in range(k):
            off = kd - half
            if off < 0:
                z = jnp.zeros_like(x[:, :(-off)])
                taps.append(jnp.concatenate([z, x[:, :off]], axis=1))
            elif off > 0:
                z = jnp.zeros_like(x[:, :off])
                taps.append(jnp.concatenate([x[:, off:], z], axis=1))
            else:
                taps.append(x)
        xm = jnp.concatenate(taps, axis=-1)
        # kernel (kd, kh, kw, I, O) -> (kh, kw, kd*I, O), matching tap order
        km = w.transpose(1, 2, 0, 3, 4).reshape(k, k, k * C, self.features)
        # output type follows the compute dtype: the TPU MXU accumulates
        # bf16 operands in fp32 regardless, and a mixed f32-out/bf16-in conv
        # breaks the transpose (gradient) dtype pairing
        y = jax.lax.conv_general_dilated(
            xm.reshape(B * D, H, W, k * C), km.astype(self.dtype), (1, 1),
            'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=self.dtype)
        y = y + b.astype(self.dtype)
        return y.reshape(B, D, H, W, self.features)


class GroupNorm(nn.Module):
    """GroupNorm(32) with fp32 statistics regardless of compute dtype."""
    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name='norm')(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def _fusable_gn_conv(shape, out_ch: int) -> bool:
    """Static-shape gate for the fused GN+SiLU+conv kernel: planes large
    enough to feed the MXU (>= 32^2 rows), lane-aligned channels, and a
    VMEM budget that holds three normalized planes (C <= 256). Both convs
    of the block run through the kernel, so the OUTPUT channel count must
    satisfy the same envelope (the second conv is out_ch -> out_ch)."""
    B, D, H, W, C = shape
    ch_ok = lambda c: c % 128 == 0 and c <= 256
    return H * W >= 1024 and W % 8 == 0 and ch_ok(C) and ch_ok(out_ch)


class _GNParams(nn.Module):
    """Parameter-only stand-in for the GroupNorm wrapper: same tree paths
    (<name>/norm/{scale,bias})."""
    features: int

    @nn.compact
    def __call__(self):
        return _ParamHolder(features=self.features, name='norm')(None)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for Conv3D: same tree paths/shapes
    (<name>/conv/{kernel,bias}) so checkpoints are implementation-free."""
    features: int
    kernel: int = 3
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, in_ch: int):
        holder = _ConvParamLeaf(features=self.features, kernel=self.kernel,
                                init_scale=self.init_scale, name='conv')
        return holder(in_ch)


class _ConvParamLeaf(nn.Module):
    features: int
    kernel: int
    init_scale: float

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.kernel
        w = self.param('kernel', ddpm_init(self.init_scale),
                       (k, k, k, in_ch, self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        return w, b


class ResnetBlockDDPM(nn.Module):
    """GN-SiLU-conv / +temb / GN-SiLU-drop-conv(zero) with NIN shortcut.

    Reference layers.py:646-689. ``fused_gn_conv``: route each
    GN+SiLU+conv3 chain through the single-pass Pallas kernel
    (ops/gn_silu_conv.py) on TPU — identical math (fp32 GN statistics,
    bf16 conv) and an identical param tree, with automatic fallback for
    shapes outside the kernel's envelope and for the dropout-active
    second conv. ``fused_gn`` (legacy, standalone GN kernel) is kept for
    the recorded negative result in BASELINE.md.
    """
    out_ch: Optional[int] = None
    temb_dim: Optional[int] = None
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    fused_gn: bool = False
    fused_gn_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        if self.fused_gn_conv and _fusable_gn_conv(x.shape, out_ch):
            h = self._fused_body(x, temb, out_ch, deterministic)
        else:
            h = self._plain_body(x, temb, out_ch, deterministic)
        if in_ch != out_ch:
            x = NIN(out_ch, dtype=self.dtype, name='NIN_0')(x)
        return x + h

    def _plain_body(self, x, temb, out_ch, deterministic):
        GN = _FusedGN if self.fused_gn else GroupNorm
        h = GN(name='GroupNorm_0')(x) if self.fused_gn \
            else nn.silu(GroupNorm(name='GroupNorm_0')(x))
        h = Conv3D(out_ch, 3, dtype=self.dtype, name='Conv_0')(h)
        h = self._add_temb(h, temb)
        h = GN(name='GroupNorm_1')(h) if self.fused_gn \
            else nn.silu(GroupNorm(name='GroupNorm_1')(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return Conv3D(out_ch, 3, init_scale=0.0, dtype=self.dtype,
                      name='Conv_1')(h)

    def _fused_body(self, x, temb, out_ch, deterministic):
        from ..ops.gn_silu_conv import (gn_silu_conv3d,
                                        gn_silu_conv3d_reference)
        in_ch = x.shape[-1]
        sc0, bi0 = _GNParams(in_ch, name='GroupNorm_0')()
        kw0, kb0 = _ConvParams(out_ch, name='Conv_0')(in_ch)
        sc1, bi1 = _GNParams(out_ch, name='GroupNorm_1')()
        kw1, kb1 = _ConvParams(out_ch, init_scale=0.0, name='Conv_1')(out_ch)

        h = gn_silu_conv3d(x, sc0, bi0, kw0, kb0, 32, 1e-6, self.dtype)
        h = self._add_temb(h, temb)
        if deterministic or self.dropout == 0.0:
            return gn_silu_conv3d(h, sc1, bi1, kw1, kb1, 32, 1e-6, self.dtype)
        # dropout sits between SiLU and the conv: decomposed path with the
        # same parameters (training only; fp32-stat GN as everywhere).
        from ..ops.groupnorm import groupnorm_silu_reference
        t = groupnorm_silu_reference(h, sc1, bi1)
        t = nn.Dropout(self.dropout, deterministic=False)(t)
        y = jax.lax.conv_general_dilated(
            t.astype(self.dtype), kw1.astype(self.dtype), (1, 1, 1), 'SAME',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=self.dtype)
        return y + kb1.astype(self.dtype)

    def _add_temb(self, h, temb):
        if temb is None:
            return h
        t = nn.Dense(h.shape[-1], kernel_init=ddpm_init(),
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name='Dense_0')(nn.silu(temb))
        return h + t[:, None, None, None, :].astype(h.dtype)


class _FusedGN(nn.Module):
    """GroupNorm+SiLU via the Pallas kernel, with the same param tree as the
    flax GroupNorm wrapper (norm/scale, norm/bias)."""
    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.groupnorm import fused_groupnorm_silu
        C = x.shape[-1]
        scope = _ParamHolder(features=C, name='norm')
        scale, bias = scope(x)
        return fused_groupnorm_silu(x, scale, bias,
                                    num_groups=self.num_groups, eps=self.eps)


class _ParamHolder(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return scale, bias


class AttnBlock(nn.Module):
    """Full self-attention over the flattened volume (runs at 16 cubed only).

    Same math as reference layers.py:585-608 but expressed as batched
    (B, S, C) matmuls for the MXU.
    """
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        h = GroupNorm(name='GroupNorm_0')(x)
        q = NIN(C, dtype=self.dtype, name='NIN_0')(h)
        k = NIN(C, dtype=self.dtype, name='NIN_1')(h)
        v = NIN(C, dtype=self.dtype, name='NIN_2')(h)
        S = D * H * W
        q = q.reshape(B, S, C)
        k = k.reshape(B, S, C)
        v = v.reshape(B, S, C)
        w = jnp.einsum('bsc,btc->bst', q, k,
                       preferred_element_type=jnp.float32) * (C ** -0.5)
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum('bst,btc->bsc', w.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        h = h.reshape(B, D, H, W, C)
        h = NIN(C, init_scale=0.0, dtype=self.dtype, name='NIN_3')(h)
        return x + h


class Upsample(nn.Module):
    """Nearest x2 then optional conv3x3 (reference layers.py:611-623)."""
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        h = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
        if self.with_conv:
            h = Conv3D(C, 3, dtype=self.dtype, name='Conv_0')(h)
        return h


class Downsample(nn.Module):
    """Stride-2 conv with right-pad-1 'SAME' emulation, or avg-pool.

    Reference layers.py:626-643 pads (0,1) on each spatial dim then applies a
    VALID 3x3x3 stride-2 conv.
    """
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        if self.with_conv:
            pad = [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)]
            h = jnp.pad(x, pad)
            h = Conv3D(C, 3, stride=2, padding='VALID', dtype=self.dtype,
                       name='Conv_0')(h)
        else:
            h = nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))
        assert h.shape == (B, D // 2, H // 2, W // 2, C)
        return h
