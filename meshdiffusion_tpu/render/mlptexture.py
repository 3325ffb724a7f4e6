"""Neural 3D texture: multiresolution hash-grid encoding + small MLP.

Counterpart of reference ``nvdiffrec/lib/render/mlptexture.py`` which wraps
tiny-cuda-nn's CUDA HashGrid + FullyFusedMLP (mlptexture.py:47-104). The
TPU-native version is pure XLA: integer spatial hashing + gather + trilinear
blend per level (all levels vectorized), then a flax MLP. The reference's
x128 gradient rescaling trick (mlptexture.py:71-73,82: scale MLP grads up,
encoder grads down, to keep fp16 grads representable) is unnecessary in
fp32/bf16-master training and is omitted; a custom_vjp hook could restore it
if mixed-precision fitting ever needs it.

Hash function follows the standard instant-ngp spatial hash
(pi = [1, 2654435761, 805459861]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def hash_encode(x: jnp.ndarray, table: jnp.ndarray, resolutions: np.ndarray
                ) -> jnp.ndarray:
    """Multilevel hash encoding.

    x: (N, 3) in [0, 1]; table: (L, T, F); resolutions: (L,) ints.
    Returns (N, L*F).
    """
    L, T, F = table.shape
    outs = []
    for lvl in range(L):
        res = int(resolutions[lvl])
        xs = x * res                      # (N, 3)
        x0 = jnp.floor(xs).astype(jnp.int32)
        frac = xs - x0

        feat = 0.0
        for corner in range(8):
            offs = jnp.asarray([(corner >> 0) & 1, (corner >> 1) & 1,
                                (corner >> 2) & 1], jnp.int32)
            c = x0 + offs                                # (N, 3)
            c = jnp.clip(c, 0, res).astype(jnp.uint32)
            h = ((c[:, 0] * jnp.uint32(_PRIMES[0]))
                 ^ (c[:, 1] * jnp.uint32(_PRIMES[1]))
                 ^ (c[:, 2] * jnp.uint32(_PRIMES[2])))
            idx = jnp.remainder(h, jnp.uint32(T)).astype(jnp.int32)
            w = jnp.prod(jnp.where(offs[None, :] == 1, frac, 1.0 - frac),
                         axis=-1, keepdims=True)         # (N, 1)
            feat = feat + table[lvl, idx] * w
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)


class HashEncoder(nn.Module):
    """instant-ngp style hash grid: 16 levels, 2 feats, 2^19 table,
    base 16 -> 4096 (reference mlptexture.py:57-69)."""
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 4096

    def resolutions(self) -> np.ndarray:
        g = np.exp(np.log(self.desired_resolution / self.base_resolution)
                   / (self.num_levels - 1))
        return np.round(self.base_resolution * g ** np.arange(self.num_levels)
                        ).astype(np.int64)

    @property
    def n_output_dims(self) -> int:
        return self.num_levels * self.features_per_level

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T = 2 ** self.log2_hashmap_size
        table = self.param(
            'table',
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -1e-4, 1e-4),
            (self.num_levels, T, self.features_per_level))
        return hash_encode(x, table, self.resolutions())


class MLPTexture3D(nn.Module):
    """Hash-encoded neural 3D texture (reference mlptexture.py:47-104)."""
    aabb: Tuple  # (min (3,), max (3,)) static arrays
    channels: int = 9
    internal_dims: int = 32
    hidden: int = 2
    min_max: Optional[Tuple] = None

    @nn.compact
    def __call__(self, texc: jnp.ndarray) -> jnp.ndarray:
        lo = jnp.asarray(self.aabb[0], jnp.float32)
        hi = jnp.asarray(self.aabb[1], jnp.float32)
        shape = texc.shape
        x = (texc.reshape(-1, 3) - lo) / (hi - lo)
        x = jnp.clip(x, 0.0, 1.0)
        h = HashEncoder(name='encoder')(x)
        kaiming = nn.initializers.variance_scaling(2.0, 'fan_in', 'uniform')
        for i in range(self.hidden):
            h = nn.relu(nn.Dense(self.internal_dims, use_bias=False,
                                 kernel_init=kaiming, name=f'dense_{i}')(h))
        out = nn.Dense(self.channels, use_bias=False, kernel_init=kaiming,
                       name=f'dense_{self.hidden}')(h)
        if self.min_max is not None:
            lo_v = jnp.asarray(self.min_max[0], jnp.float32)
            hi_v = jnp.asarray(self.min_max[1], jnp.float32)
            out = jax.nn.sigmoid(out) * (hi_v - lo_v) + lo_v
        return out.reshape(*shape[:-1], self.channels)


class BoundTexture3D:
    """Parameter-bound MLPTexture3D exposing the reference's .sample API so
    it can sit in a Material dict next to Texture2D."""

    def __init__(self, module: MLPTexture3D, params):
        self.module = module
        self.params = params
        self.min_max = module.min_max

    def sample(self, texc: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply(self.params, texc)

    def clamp(self):
        return self
