"""2D textures with mip hierarchies and trilinear sampling.

Counterpart of reference ``nvdiffrec/lib/render/texture.py`` (Texture2D:
40-101, create_trainable:108-135, srgb converters:141-145, file I/O:151-188)
without nvdiffrast: sampling is jnp bilinear gathers; mip levels come from
iterated 2x average pooling (the gradient w.r.t. the base texture flows
through the pooling chain by plain autodiff, matching the reference's
texture2d_mip custom function up to boundary handling).

Textures are plain pytrees (dict-compatible), so they slot into optax
optimizers directly.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import utils


def _to_nhwc(init) -> jnp.ndarray:
    x = jnp.asarray(init, jnp.float32)
    if x.ndim == 1:
        x = x[None, None, None, :]
    elif x.ndim == 3:
        x = x[None]
    assert x.ndim == 4, x.shape
    return x


@jax.tree_util.register_pytree_node_class
class Texture2D:
    """A texture: single NHWC tensor (auto mips) or explicit mip list."""

    def __init__(self, init, min_max=None):
        if isinstance(init, Texture2D):
            self.data = init.data
            self.min_max = init.min_max if min_max is None else min_max
            return
        if isinstance(init, (list, tuple)) and len(init) == 1:
            init = init[0]
        if isinstance(init, (list, tuple)):
            self.data = [_to_nhwc(m) for m in init]
        else:
            self.data = _to_nhwc(init)
        self.min_max = min_max

    # -- pytree protocol (min_max is static aux data)
    def tree_flatten(self):
        return (self.data,), (self.min_max is not None,
                              None if self.min_max is None
                              else tuple(np.asarray(m).tolist()
                                         for m in self.min_max))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data = children[0]
        has, mm = aux
        obj.min_max = [jnp.asarray(m, jnp.float32) for m in mm] if has else None
        return obj

    def get_mips(self) -> List[jnp.ndarray]:
        if isinstance(self.data, (list, tuple)):
            return list(self.data)
        mips = [self.data]
        while mips[-1].shape[1] > 1 and mips[-1].shape[2] > 1:
            mips.append(utils.avg_pool_nhwc(mips[-1], 2))
        return mips

    @property
    def res(self):
        return self.get_mips()[0].shape[1:3]

    @property
    def channels(self):
        return self.get_mips()[0].shape[3]

    def clamp(self) -> "Texture2D":
        """Range clamp (reference texture.py:91-95), functional."""
        if self.min_max is None:
            return self
        lo = jnp.asarray(self.min_max[0], jnp.float32)
        hi = jnp.asarray(self.min_max[1], jnp.float32)
        if isinstance(self.data, (list, tuple)):
            data = [jnp.clip(m, lo, hi) for m in self.data]
        else:
            data = jnp.clip(self.data, lo, hi)
        out = Texture2D.__new__(Texture2D)
        out.data = data
        out.min_max = self.min_max
        return out

    def sample(self, texc: jnp.ndarray,
               texc_deriv: Optional[jnp.ndarray] = None,
               filter_mode: str = 'linear-mipmap-linear') -> jnp.ndarray:
        """Sample at (..., 2) uv coords; trilinear across mips when derivs
        are given (nvdiffrast dr.texture equivalent, wrap boundary)."""
        mips = self.get_mips()
        if (filter_mode == 'linear' or texc_deriv is None or len(mips) == 1
                or mips[0].shape[1] == 1):
            return _sample_mip(mips[0], texc)

        # mip level from uv footprint (max of du, dv scaled to texels)
        H, W = mips[0].shape[1], mips[0].shape[2]
        du = texc_deriv[..., 0:2]
        dv = texc_deriv[..., 2:4] if texc_deriv.shape[-1] >= 4 else du
        fx = jnp.maximum(jnp.abs(du[..., 0]) * W, jnp.abs(dv[..., 0]) * W)
        fy = jnp.maximum(jnp.abs(du[..., 1]) * H, jnp.abs(dv[..., 1]) * H)
        rho = jnp.maximum(jnp.maximum(fx, fy), 1e-8)
        lod = jnp.clip(jnp.log2(rho), 0.0, len(mips) - 1 - 1e-4)
        lo = jnp.floor(lod).astype(jnp.int32)
        frac = (lod - lo)[..., None]

        samples = jnp.stack([_sample_mip(m, texc) for m in mips])  # (L, ..., C)
        s_lo = jnp.take_along_axis(
            samples, lo[None, ..., None].astype(jnp.int32), axis=0)[0]
        hi_idx = jnp.clip(lo + 1, 0, len(mips) - 1)
        s_hi = jnp.take_along_axis(
            samples, hi_idx[None, ..., None].astype(jnp.int32), axis=0)[0]
        return s_lo * (1 - frac) + s_hi * frac


def _sample_mip(mip: jnp.ndarray, texc: jnp.ndarray) -> jnp.ndarray:
    """Bilinear wrap-mode sample of an (1, H, W, C) mip at (..., 2) uv."""
    img = mip[0]
    H, W = img.shape[0], img.shape[1]
    u = texc[..., 0] * W - 0.5
    v = texc[..., 1] * H - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0 = x0.astype(jnp.int32) % W
    y0 = y0.astype(jnp.int32) % H
    x1 = (x0 + 1) % W
    y1 = (y0 + 1) % H
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def create_trainable(init, res=None, auto_mipmaps=True, min_max=None
                     ) -> Texture2D:
    """Reference texture.py:108-135."""
    if isinstance(init, Texture2D):
        min_max = init.min_max if min_max is None else min_max
        init = init.data
    x = _to_nhwc(init)
    if res is not None:
        x = utils.scale_img_nhwc(x, res)
    if not auto_mipmaps:
        chain = [x]
        while chain[-1].shape[1] > 1 or chain[-1].shape[2] > 1:
            new = (max(chain[-1].shape[1] // 2, 1), max(chain[-1].shape[2] // 2, 1))
            chain.append(utils.scale_img_nhwc(chain[-1], new))
        return Texture2D(chain, min_max=min_max)
    return Texture2D(x, min_max=min_max)


def srgb_to_rgb(texture: Texture2D) -> Texture2D:
    return Texture2D([utils.srgb_to_rgb(m) for m in texture.get_mips()])


def rgb_to_srgb(texture: Texture2D) -> Texture2D:
    return Texture2D([utils.rgb_to_srgb(m) for m in texture.get_mips()])


def load_texture2D(fn: str, lambda_fn=None, channels=None) -> Texture2D:
    img = jnp.asarray(utils.load_image(fn), jnp.float32)
    if channels is not None:
        img = img[..., 0:channels]
    if lambda_fn is not None:
        img = lambda_fn(img)
    return Texture2D(img)


def save_texture2D(fn: str, tex: Texture2D, lambda_fn=None) -> None:
    mips = tex.get_mips() if isinstance(tex.data, (list, tuple)) else [tex.data]
    import os
    for i, mip in enumerate(mips if isinstance(tex.data, (list, tuple)) else mips[:1]):
        data = np.asarray(lambda_fn(mip) if lambda_fn else mip)[0]
        if isinstance(tex.data, (list, tuple)):
            base, ext = os.path.splitext(fn)
            utils.save_image(f'{base}_{i}{ext}', data)
        else:
            utils.save_image(fn, data)
