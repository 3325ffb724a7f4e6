"""NCSN legacy refinement blocks (3D RefineNet family).

Counterparts of the reference's NCSNv1/v2 block zoo ported to 3D in
``lib/diffusion/models/layers.py:160-534`` (CRPBlock:160, RCUBlock:210,
MSFBlock:261, RefineBlock:304 + pooled conv variants:378+). They are NOT on
MeshDiffusion's live path (the DDPM U-Net uses ResnetBlockDDPM), but the
reference ships them for NCSN-style configs; provided here channels-last
for inventory parity. Convolutions use the NCSN initialization convention
(torch-default scaled — here flax lecun_normal, the practical equivalent).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv3x3(features: int, use_bias: bool = False, name: str = None):
    return nn.Conv(features, (3, 3, 3), padding='SAME', use_bias=use_bias,
                   name=name)


def _pool5(x: jnp.ndarray, maxpool: bool) -> jnp.ndarray:
    if maxpool:
        return nn.max_pool(x, (5, 5, 5), strides=(1, 1, 1), padding='SAME')
    return nn.avg_pool(x, (5, 5, 5), strides=(1, 1, 1), padding='SAME')


class CRPBlock(nn.Module):
    """Chained residual pooling (reference layers.py:160-181)."""
    features: int
    n_stages: int = 2
    act: Callable = nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, self.maxpool)
            path = _conv3x3(self.features, name=f'conv_{i}')(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (reference layers.py:210-231)."""
    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = _conv3x3(self.features, name=f'conv_{i}_{j}')(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: conv each input, resize to a common shape, sum
    (reference layers.py:261-277; trilinear resize replaces F.interpolate)."""
    features: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 shape: Tuple[int, int, int]) -> jnp.ndarray:
        out = None
        for i, x in enumerate(xs):
            h = _conv3x3(self.features, use_bias=True, name=f'conv_{i}')(x)
            h = jax.image.resize(
                h, (h.shape[0],) + tuple(shape) + (self.features,), 'linear')
            out = h if out is None else out + h
        return out


class RefineBlock(nn.Module):
    """RefineNet block: per-input RCUs -> MSF -> CRP -> output RCUs
    (reference layers.py:304-337)."""
    features: int
    act: Callable = nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 output_shape: Tuple[int, int, int]) -> jnp.ndarray:
        hs = []
        for i, x in enumerate(xs):
            hs.append(RCUBlock(x.shape[-1], 2, 2, self.act,
                               name=f'adapt_{i}')(x))
        if len(xs) > 1:
            h = MSFBlock(self.features, name='msf')(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, self.maxpool, name='crp')(h)
        h = RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                     name='out_rcu')(h)
        return h


class ConvMeanPool(nn.Module):
    """conv then 2x mean pool over (H, W) (reference layers.py:378-396)."""
    features: int
    kernel: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.features, (self.kernel,) * 3, padding='SAME',
                    use_bias=self.use_bias, name='conv')(x)
        return (h[:, :, ::2, ::2] + h[:, :, 1::2, ::2]
                + h[:, :, ::2, 1::2] + h[:, :, 1::2, 1::2]) / 4.0


class MeanPoolConv(nn.Module):
    """2x mean pool over (H, W) then conv (reference layers.py:399+)."""
    features: int
    kernel: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = (x[:, :, ::2, ::2] + x[:, :, 1::2, ::2]
             + x[:, :, ::2, 1::2] + x[:, :, 1::2, 1::2]) / 4.0
        return nn.Conv(self.features, (self.kernel,) * 3, padding='SAME',
                       use_bias=self.use_bias, name='conv')(h)
