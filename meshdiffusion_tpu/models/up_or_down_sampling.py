"""Naive 3D up/down-sampling helpers (API parity module).

Counterpart of reference ``lib/diffusion/models/up_or_down_sampling.py``.
The reference module's FIR-filtered paths call a nonexistent ``upfirdn2d``
(reference up_or_down_sampling.py:142,178 — dead code); only the naive
variants are reachable, and those are what this module provides. The fused
StyleGAN2-style Conv3d wrapper reduces to conv + naive resample here.
"""

from __future__ import annotations

import jax.numpy as jnp


def naive_upsample_3d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor x`factor` upsampling, channels-last (B, D, H, W, C)."""
    for axis in (1, 2, 3):
        x = jnp.repeat(x, factor, axis=axis)
    return x


def naive_downsample_3d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Average-pool downsampling by `factor`, channels-last."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // factor, factor, H // factor, factor,
                  W // factor, factor, C)
    return x.mean(axis=(2, 4, 6))
