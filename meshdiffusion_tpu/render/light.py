"""Split-sum environment light with cubemap filtering.

Counterpart of reference ``nvdiffrec/lib/render/light.py`` (EnvironmentLight:
45-142, HDR loader:149-172) and the cubemap-filter CUDA kernels
(``renderutils/c_src/cubemap.cu:110-300``). TPU-native design:

* the mip chain is iterated 2x average pooling (autodiff supplies the
  backward; the reference's custom cube-sampled backward is an
  approximation of the same adjoint);
* the diffuse (cosine) convolution runs at LIGHT_MIN_RES (16) where a FULL
  pairwise texel-to-texel einsum is only (6*16^2)^2 ~ 2.4M dot products —
  one small MXU matmul instead of a bespoke kernel;
* GGX specular prefiltering uses the same full-contraction structure per mip
  level, evaluated lazily (MeshDiffusion's live fitting path is
  diffuse-only: reference render.py:93-104 raises on 'pbr').

All filtering is exact over the hemisphere, including the solid-angle
weights the CUDA kernel approximates with its bound tables.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import utils

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


def _texel_dirs_weights(res: int):
    """Unit directions + solid-angle weights for all 6*res*res cubemap texels."""
    gx, gy = utils._face_grid((res, res))
    dirs, weights = [], []
    for s in range(6):
        v = utils.cube_to_dir(s, gx, gy)
        norm2 = jnp.sum(v * v, axis=-1)
        # solid angle of a cube-face texel: 4/res^2 / |v|^3 (pre-normalization)
        w = (2.0 / res) ** 2 / jnp.power(norm2, 1.5)
        dirs.append(v / jnp.sqrt(norm2)[..., None])
        weights.append(w)
    return (jnp.stack(dirs).reshape(-1, 3),
            jnp.stack(weights).reshape(-1))


def diffuse_cubemap(cubemap: jnp.ndarray) -> jnp.ndarray:
    """Cosine-convolved irradiance cubemap (reference cubemap.cu
    DiffuseCubemapFwdKernel semantics): out(n) = sum_i max(n.d_i, 0) w_i L_i
    / sum max(n.d_i,0) w_i."""
    res = cubemap.shape[1]
    dirs, w = _texel_dirs_weights(res)
    L = cubemap.reshape(-1, cubemap.shape[-1])          # (T, C)
    cos = jnp.clip(dirs @ dirs.T, min=0.0)               # (T, T) MXU matmul
    cw = cos * w[None, :]
    out = (cw @ L) / jnp.sum(cw, axis=1, keepdims=True)
    return out.reshape(cubemap.shape)


def _ggx_ndf(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, 1e-4, 1.0)
    d = (c * alpha_sqr - c) * c + 1
    return alpha_sqr / (d * d * np.pi)


def specular_cubemap(cubemap: jnp.ndarray, roughness: float,
                     cutoff: float = 0.99, chunk: int = 2048) -> jnp.ndarray:
    """GGX-prefiltered cubemap (reference cubemap.cu SpecularCubemapKernel):
    out(r) = sum_i D_ggx(r.d_i) w_i L_i / norm, exact full contraction in
    row chunks to bound memory."""
    res = cubemap.shape[1]
    dirs, w = _texel_dirs_weights(res)
    L = cubemap.reshape(-1, cubemap.shape[-1])
    alpha = roughness * roughness
    alpha_sqr = alpha * alpha

    def row_block(d_block):
        cos = jnp.clip(d_block @ dirs.T, min=0.0)
        k = _ggx_ndf(alpha_sqr, cos) * w[None, :] * cos
        num = k @ L
        den = jnp.sum(k, axis=1, keepdims=True)
        return num / jnp.maximum(den, 1e-8)

    n = dirs.shape[0]
    outs = []
    for s in range(0, n, chunk):
        outs.append(row_block(dirs[s:s + chunk]))
    out = jnp.concatenate(outs, axis=0)
    return out.reshape(cubemap.shape)


def cubemap_mip(cubemap: jnp.ndarray) -> jnp.ndarray:
    """One mip level: 2x average pooling over each face
    (reference light.py:24-39; backward by autodiff)."""
    return utils.avg_pool_nhwc(cubemap, 2)


class EnvironmentLight:
    """Trainable 6xHxWx3 cubemap light; pytree-friendly via .base."""

    def __init__(self, base: jnp.ndarray, trainable: bool = True):
        self.base = jnp.asarray(base, jnp.float32)
        self.trainable = trainable
        self.diffuse: Optional[jnp.ndarray] = None
        self.specular: List[jnp.ndarray] = []
        self.mtx = None

    def xfm(self, mtx):
        self.mtx = mtx

    def clone(self) -> "EnvironmentLight":
        return EnvironmentLight(self.base, self.trainable)

    def clamp(self, min=None, max=None) -> None:
        self.base = jnp.clip(self.base, min, max)

    def get_mip(self, roughness: jnp.ndarray) -> jnp.ndarray:
        n = len(self.specular)
        return jnp.where(
            roughness < MAX_ROUGHNESS,
            (jnp.clip(roughness, MIN_ROUGHNESS, MAX_ROUGHNESS) - MIN_ROUGHNESS)
            / (MAX_ROUGHNESS - MIN_ROUGHNESS) * (n - 2),
            (jnp.clip(roughness, MAX_ROUGHNESS, 1.0) - MAX_ROUGHNESS)
            / (1.0 - MAX_ROUGHNESS) + n - 2)

    def build_mips(self, cutoff: float = 0.99, with_specular: bool = False
                   ) -> None:
        """Mip chain + diffuse irradiance (+ optional GGX prefiltered chain).

        The reference always prefilters specular (light.py:73-83) but
        MeshDiffusion's shader only consumes the diffuse map; pass
        with_specular=True for the full split-sum chain.
        """
        chain = [self.base]
        while chain[-1].shape[1] > LIGHT_MIN_RES:
            chain.append(cubemap_mip(chain[-1]))
        self.diffuse = diffuse_cubemap(chain[-1])
        if with_specular:
            spec = []
            for idx in range(len(chain) - 1):
                r = (idx / (len(chain) - 2)) * (MAX_ROUGHNESS - MIN_ROUGHNESS) \
                    + MIN_ROUGHNESS
                spec.append(specular_cubemap(chain[idx], r, cutoff))
            spec.append(specular_cubemap(chain[-1], 1.0, cutoff))
            self.specular = spec
        else:
            self.specular = chain

    def regularizer(self) -> jnp.ndarray:
        white = jnp.mean(self.base, axis=-1, keepdims=True)
        return jnp.mean(jnp.abs(self.base - white))

    def shade(self, gb_pos, gb_normal, kd, ks, view_pos, specular=False,
              xfm_lgt=None):
        """Diffuse split-sum shading (reference light.py:89-142; the live
        MeshDiffusion path is diffuse-only — specular raises there too)."""
        from . import ops
        nrmvec = gb_normal
        if xfm_lgt is not None:
            m = jnp.asarray(xfm_lgt, jnp.float32)
            B, H, W, _ = nrmvec.shape
            nrmvec = ops.xfm_vectors(nrmvec.reshape(B, H * W, 3), m
                                     ).reshape(B, H, W, 3)
        diff_col = kd
        diffuse = utils.sample_cubemap(self.diffuse, nrmvec)
        shaded_col = diffuse * diff_col
        if specular:
            raise NotImplementedError(
                'specular split-sum shading: parity with reference '
                'light.py:124-125 which also raises')
        return shaded_col * (1.0 - ks[..., 0:1])


def load_env(fn: str, scale: float = 1.0, trainable: bool = True
             ) -> EnvironmentLight:
    """HDR latlong -> 512^2 cubemap light (reference light.py:149-172)."""
    ext = os.path.splitext(fn)[1].lower()
    assert ext == '.hdr', f'Unknown envlight extension {ext}'
    latlong = jnp.asarray(utils.load_image(fn), jnp.float32) * scale
    cubemap = utils.latlong_to_cubemap(latlong, (512, 512))
    light = EnvironmentLight(cubemap, trainable=trainable)
    light.build_mips()
    return light


def create_trainable_env_rnd(base_res: int, scale: float = 0.5,
                             bias: float = 0.25, seed: int = 0
                             ) -> EnvironmentLight:
    base = jax.random.uniform(jax.random.key(seed),
                              (6, base_res, base_res, 3)) * scale + bias
    return EnvironmentLight(base)
