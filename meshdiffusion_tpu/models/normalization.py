"""Normalization factory and the NCSN instance-norm zoo.

Counterpart of reference ``lib/diffusion/models/normalization.py`` (factory
:22-40, ConditionalInstanceNorm3dPlus and friends). The live MeshDiffusion
path uses plain GroupNorm (configs set normalization='GroupNorm'); the
conditional/instance variants are provided for API parity with NCSN-style
configs, in channels-last layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def get_normalization(config, conditional: bool = False):
    """Return a norm module class per config.model.normalization
    (reference normalization.py:22-40)."""
    norm = config.model.normalization
    if conditional:
        if norm == 'InstanceNorm++':
            return ConditionalInstanceNorm3dPlus
        raise NotImplementedError(f'{norm} not implemented yet.')
    if norm == 'InstanceNorm':
        return InstanceNorm3d
    if norm == 'InstanceNorm++':
        return InstanceNorm3dPlus
    if norm == 'GroupNorm':
        return lambda **kw: nn.GroupNorm(num_groups=32, epsilon=1e-6, **kw)
    raise ValueError('Unknown normalization: %s' % norm)


class InstanceNorm3d(nn.Module):
    """Per-channel instance norm over (D, H, W), channels-last."""
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        gamma = self.param('gamma', nn.initializers.ones, (C,))
        h = h * gamma
        if self.bias:
            beta = self.param('beta', nn.initializers.zeros, (C,))
            h = h + beta
        return h


class InstanceNorm3dPlus(nn.Module):
    """NCSN InstanceNorm++: re-injects the cross-channel mean statistics so
    color shifts survive normalization (reference normalization.py, 3D port
    of NCSNv2's InstanceNorm2dPlus)."""
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        means = x.mean(axis=(1, 2, 3))                     # (B, C)
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)      # (B, C)

        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)

        gamma = self.param('gamma', nn.initializers.ones, (C,))
        alpha = self.param('alpha', nn.initializers.ones, (C,))
        h = h + means_norm[:, None, None, None, :] * alpha
        h = h * gamma
        if self.bias:
            beta = self.param('beta', nn.initializers.zeros, (C,))
            h = h + beta
        return h


class ConditionalInstanceNorm3dPlus(nn.Module):
    """Class-conditional InstanceNorm++: per-class gamma/alpha/beta gathered
    by the integer condition label."""
    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        means = x.mean(axis=(1, 2, 3))
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)

        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)

        n_out = 3 if self.bias else 2
        embed = self.param(
            'embed',
            lambda key, shape: jnp.concatenate(
                [jnp.ones(shape[:1] + (2 * C,)) +
                 0.02 * jnp.zeros(shape[:1] + (2 * C,)),
                 jnp.zeros(shape[:1] + (C,))] if self.bias else
                [jnp.ones(shape[:1] + (2 * C,))], axis=-1),
            (self.num_classes,))
        g = embed[y.astype(jnp.int32)]                     # (B, n_out*C)
        gamma, alpha = g[:, :C], g[:, C:2 * C]
        h = h + means_norm[:, None, None, None, :] * alpha[:, None, None, None, :]
        h = h * gamma[:, None, None, None, :]
        if self.bias:
            beta = g[:, 2 * C:]
            h = h + beta[:, None, None, None, :]
        return h
