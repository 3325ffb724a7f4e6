"""3D U-Net score network (DDPM-style), channels-last, flax.linen.

Behavioral counterpart of the reference's ``lib/diffusion/models/ddpm_res64.py``
(DDPMRes64) and ``ddpm_res128.py`` (DDPMRes128), expressed as one
parameterized module:

* ``stem_kernel=3, use_coords=True, num_res_blocks_first=None``  -> res64
  (reference ddpm_res64.py:84-121; level 0 uses the same block count as the
  other levels, and a zeroed coordinate volume feeds a ``pos_layer`` conv
  whose output is just its bias — kept for checkpoint parity).
* ``stem_kernel=5, use_coords=False, num_res_blocks_first=2``    -> res128
  (reference ddpm_res128.py:90-132; 5x5x5 stem/output convs and level 0
  hard-wired to 2 res-blocks).

TPU-first design notes: activations are NDHWC; attention at 16 cubed is two
batched MXU matmuls; convs may compute in bfloat16 while parameters, GroupNorm
statistics and the network output stay float32. The static grid mask enters
through a dedicated stem conv exactly like the reference (ddpm_res64.py:148).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import layers
from .registry import register_model, register_alias

Dtype = Any


def _apply_block(mdl, x, temb, deterministic):
    """Array-signature adapter so nn.remat can mark `deterministic` static."""
    return mdl(x, temb, deterministic=deterministic)


# lifted remat of one ResnetBlock: backward recomputes the block's
# internals from its (x, temb) boundary instead of saving every GN/SiLU/conv
# intermediate — peak activation memory drops from O(blocks x tensors) to
# O(blocks) saved boundaries + one block's internals. Param tree and
# train-mode forward values are identical to the plain call; gradients match
# to float32 ulp (XLA refuses bit-exactness: remat changes fusion, which
# reassociates reductions). Tested in test_model.py::test_remat_blocks_parity.
_remat_block = nn.remat(_apply_block, static_argnums=(3,))


class UNet3D(nn.Module):
    """DDPM 3D U-Net over (B, R, R, R, C) grids."""

    image_size: int = 64
    channels: int = 4
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 4, 4)
    num_res_blocks: int = 3
    num_res_blocks_first: Optional[int] = None  # None -> num_res_blocks
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    centered: bool = True
    stem_kernel: int = 3
    use_coords: bool = True
    scale_by_sigma: bool = False
    sigma_min: float = 0.01
    sigma_max: float = 378.0
    num_scales: int = 1000
    dtype: Dtype = jnp.float32
    fused_gn: bool = False
    fused_gn_conv: bool = False
    remat_blocks: bool = True   # remat ResnetBlocks when train=True

    @classmethod
    def from_config(cls, config, **overrides):
        m = config.model
        is_128 = 'res128' in m.name
        kw = dict(
            image_size=config.data.image_size,
            channels=config.data.num_channels,
            nf=m.nf,
            ch_mult=tuple(m.ch_mult),
            num_res_blocks=m.num_res_blocks,
            num_res_blocks_first=(m.get('num_res_blocks_first', None) if is_128 else None),
            attn_resolutions=tuple(m.attn_resolutions),
            dropout=m.dropout,
            resamp_with_conv=m.resamp_with_conv,
            conditional=m.conditional,
            centered=config.data.centered,
            stem_kernel=5 if is_128 else 3,
            use_coords=not is_128,
            scale_by_sigma=m.scale_by_sigma,
            sigma_min=m.sigma_min,
            sigma_max=m.sigma_max,
            num_scales=m.num_scales,
            dtype=jnp.dtype(config.tpu.compute_dtype) if 'tpu' in config else jnp.float32,
            fused_gn=bool(config.tpu.get('fused_groupnorm', False)) if 'tpu' in config else False,
            fused_gn_conv=bool(config.tpu.get('fused_gn_silu_conv', False)) if 'tpu' in config else False,
            remat_blocks=bool(config.tpu.get('remat_blocks', True)) if 'tpu' in config else True,
        )
        kw.update(overrides)
        return cls(**kw)

    def level_blocks(self, i_level: int) -> int:
        if i_level == 0 and self.num_res_blocks_first is not None:
            return self.num_res_blocks_first
        return self.num_res_blocks

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, *,
                 train: bool = False) -> jnp.ndarray:
        """x: (B, R, R, R, C) channels-last. labels: (B,) float timestep labels
        in [0, num_scales-1]. mask: (1, R, R, R, 1) static grid mask."""
        assert x.ndim == 5 and x.shape[-1] == self.channels
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_resolutions = [self.image_size // (2 ** i) for i in range(num_resolutions)]
        act = nn.silu
        dt = self.dtype

        # remat only under train: forward-only sampling keeps XLA's full
        # cross-op fusion freedom (jax.checkpoint only changes the backward,
        # but prevent_cse could perturb forward-only fusion)
        blk = _remat_block if (self.remat_blocks and train) else _apply_block
        Res = lambda out_ch, name: (
            lambda h_in, temb_in, deterministic: blk(
                layers.ResnetBlockDDPM(
                    out_ch=out_ch, temb_dim=4 * nf, dropout=self.dropout,
                    dtype=dt, fused_gn=self.fused_gn,
                    fused_gn_conv=self.fused_gn_conv, name=name),
                h_in, temb_in, deterministic))

        # timestep embedding
        if self.conditional:
            temb = layers.get_timestep_embedding(labels, nf)
            temb = nn.Dense(nf * 4, kernel_init=layers.ddpm_init(),
                            bias_init=nn.initializers.zeros,
                            param_dtype=jnp.float32, name='temb_0')(temb)
            temb = nn.Dense(nf * 4, kernel_init=layers.ddpm_init(),
                            bias_init=nn.initializers.zeros,
                            param_dtype=jnp.float32, name='temb_1')(act(temb))
        else:
            temb = None

        h = x if self.centered else 2 * x - 1.0
        h = h.astype(dt)

        # stem: conv(x) [+ pos_layer(zero coords)] + mask_layer(mask)
        R = self.image_size
        stem = layers.Conv3D(nf, self.stem_kernel, dtype=dt, name='stem')(h)
        if self.use_coords:
            # Reference ddpm_res64.py:74-78 zeroes the coordinate volume, so
            # this conv contributes only its bias; XLA folds conv(0) away.
            coords = jnp.zeros((1, R, R, R, 3), dtype=dt)
            stem = stem + layers.Conv3D(nf, self.stem_kernel, dtype=dt,
                                        name='pos_layer')(coords)
        if mask is None:
            mask = jnp.zeros((1, R, R, R, 1), dtype=dt)
        stem = stem + layers.Conv3D(nf, self.stem_kernel, dtype=dt,
                                    name='mask_layer')(mask.astype(dt))

        # down path
        hs = [stem]
        for i_level in range(num_resolutions):
            for i_block in range(self.level_blocks(i_level)):
                h = Res(nf * self.ch_mult[i_level],
                        f'down_{i_level}_{i_block}')(hs[-1], temb, not train)
                if all_resolutions[i_level] in self.attn_resolutions:
                    h = layers.AttnBlock(dtype=dt,
                                         name=f'down_{i_level}_{i_block}_attn')(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(layers.Downsample(with_conv=self.resamp_with_conv,
                                            dtype=dt,
                                            name=f'down_{i_level}_downsample')(hs[-1]))

        # middle
        h = hs[-1]
        h = Res(None, 'mid_0')(h, temb, not train)
        h = layers.AttnBlock(dtype=dt, name='mid_attn')(h)
        h = Res(None, 'mid_1')(h, temb, not train)

        # up path
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.level_blocks(i_level) + 1):
                skip = hs.pop()
                h = Res(nf * self.ch_mult[i_level],
                        f'up_{i_level}_{i_block}')(
                            jnp.concatenate([h, skip], axis=-1), temb,
                            not train)
            if all_resolutions[i_level] in self.attn_resolutions:
                h = layers.AttnBlock(dtype=dt, name=f'up_{i_level}_attn')(h)
            if i_level != 0:
                h = layers.Upsample(with_conv=self.resamp_with_conv, dtype=dt,
                                    name=f'up_{i_level}_upsample')(h)

        assert not hs
        h = act(layers.GroupNorm(name='out_norm')(h))
        h = layers.Conv3D(self.channels, self.stem_kernel, init_scale=0.0,
                          dtype=dt, name='out_conv')(h)
        h = h.astype(jnp.float32)

        if self.scale_by_sigma:
            sigmas = jnp.asarray(np.exp(np.linspace(
                np.log(self.sigma_max), np.log(self.sigma_min), self.num_scales)),
                dtype=jnp.float32)
            used = sigmas[labels.astype(jnp.int32)]
            h = h / used[:, None, None, None, None]
        return h


@register_model(name='ddpm_res64')
class DDPMRes64(UNet3D):
    """res64 variant (reference ddpm_res64.py:39)."""


@register_model(name='ddpm_res128')
class DDPMRes128(UNet3D):
    """res128 variant (reference ddpm_res128.py:41)."""

    @classmethod
    def from_config(cls, config, **overrides):
        overrides.setdefault('stem_kernel', 5)
        overrides.setdefault('use_coords', False)
        return super().from_config(config, **overrides)


# The reference config names 'ddpm_res128_v2' but registers only
# 'ddpm_res128' (reference configs/res128.py:40 vs ddpm_res128.py:41).
register_alias('ddpm_res128_v2', 'ddpm_res128')
