"""Shading math ops (renderutils equivalents) in pure jax.numpy.

Counterparts of the reference's hand-written CUDA kernels under
``nvdiffrec/lib/render/renderutils/c_src/`` (bsdf.cu, normal.cu, loss.cu,
mesh.cu) and their python oracles (``renderutils/bsdf.py``,
``renderutils/loss.py``). The reference ships analytic backward kernels only
because torch eager autograd through this elementwise math was slow on GPU;
under XLA these are fusible elementwise ops and ``jax.grad`` derives the
backward — so each op here is a single forward implementation, tested against
the reference's python-oracle math (the reference's own test strategy,
renderutils/tests/*).
"""

from __future__ import annotations

import math
import jax.numpy as jnp

from .utils import dot, safe_normalize

NORMAL_THRESHOLD = 0.1
SPECULAR_EPSILON = 1e-4


# --------------------------------------------------------- shading normals

def _bend_normal(view_vec, smooth_nrm, geom_nrm, two_sided_shading):
    """Backface flip + clamped blend (reference bsdf.py:28-35)."""
    if two_sided_shading:
        front = dot(geom_nrm, view_vec) > 0
        smooth_nrm = jnp.where(front, smooth_nrm, -smooth_nrm)
        geom_nrm = jnp.where(front, geom_nrm, -geom_nrm)
    t = jnp.clip(dot(view_vec, smooth_nrm) / NORMAL_THRESHOLD, 0.0, 1.0)
    return geom_nrm + t * (smooth_nrm - geom_nrm)


def _perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl):
    smooth_bitang = safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
    sign = -1.0 if opengl else 1.0
    shading_nrm = (smooth_tng * perturbed_nrm[..., 0:1]
                   + sign * smooth_bitang * perturbed_nrm[..., 1:2]
                   + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], min=0.0))
    return safe_normalize(shading_nrm)


def prepare_shading_normal(pos, view_pos, perturbed_nrm, smooth_nrm,
                           smooth_tng, geom_nrm, two_sided_shading=True,
                           opengl=True):
    """Tangent-frame normal perturbation + two-sided bend
    (reference bsdf.py:46-54, CUDA normal.cu:98-128)."""
    smooth_nrm = safe_normalize(smooth_nrm)
    view_vec = safe_normalize(view_pos - pos)
    if smooth_tng is None or perturbed_nrm is None:
        shading_nrm = smooth_nrm
    else:
        smooth_tng = safe_normalize(smooth_tng)
        shading_nrm = _perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng,
                                      opengl)
    return _bend_normal(view_vec, shading_nrm, geom_nrm, two_sided_shading)


# ------------------------------------------------------------------- BSDFs

def lambert(nrm, wi):
    return jnp.clip(dot(nrm, wi), min=0.0) / math.pi


def fresnel_shlick(f0, f90, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    return f0 + (f90 - f0) * (1.0 - c) ** 5.0


def frostbite_diffuse(nrm, wi, wo, linear_roughness):
    wiDotN = dot(wi, nrm)
    woDotN = dot(wo, nrm)
    h = safe_normalize(wo + wi)
    wiDotH = dot(wi, h)
    energy_bias = 0.5 * linear_roughness
    energy_factor = 1.0 - (0.51 / 1.51) * linear_roughness
    f90 = energy_bias + 2.0 * wiDotH * wiDotH * linear_roughness
    wi_scatter = fresnel_shlick(1.0, f90, wiDotN)
    wo_scatter = fresnel_shlick(1.0, f90, woDotN)
    res = wi_scatter * wo_scatter * energy_factor
    return jnp.where((wiDotN > 0.0) & (woDotN > 0.0), res, jnp.zeros_like(res))


def ndf_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    d = (c * alpha_sqr - c) * c + 1
    return alpha_sqr / (d * d * math.pi)


def lambda_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    c2 = c * c
    tan2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1 + alpha_sqr * tan2) - 1.0)


def masking_smith(alpha_sqr, cos_theta_i, cos_theta_o):
    return 1 / (1 + lambda_ggx(alpha_sqr, cos_theta_i)
                + lambda_ggx(alpha_sqr, cos_theta_o))


def pbr_specular(col, nrm, wo, wi, alpha, min_roughness=0.08):
    _alpha = jnp.clip(alpha, min_roughness * min_roughness, 1.0)
    alpha_sqr = _alpha * _alpha
    h = safe_normalize(wo + wi)
    woDotN = dot(wo, nrm)
    wiDotN = dot(wi, nrm)
    woDotH = dot(wo, h)
    nDotH = dot(nrm, h)
    D = ndf_ggx(alpha_sqr, nDotH)
    G = masking_smith(alpha_sqr, woDotN, wiDotN)
    F = fresnel_shlick(col, 1, woDotH)
    w = F * D * G * 0.25 / jnp.clip(woDotN, min=SPECULAR_EPSILON)
    frontfacing = (woDotN > SPECULAR_EPSILON) & (wiDotN > SPECULAR_EPSILON)
    return jnp.where(frontfacing, w, jnp.zeros_like(w))


def pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos, min_roughness=0.08,
             bsdf='lambert'):
    """Full punctual-light PBR BSDF (reference bsdf.py:139-154)."""
    wo = safe_normalize(view_pos - pos)
    wi = safe_normalize(light_pos - pos)
    spec_str = arm[..., 0:1]
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1 - spec_str)
    kd = kd * (1.0 - metallic)
    if bsdf == 'lambert':
        diffuse = kd * lambert(nrm, wi)
    else:
        diffuse = kd * frostbite_diffuse(nrm, wi, wo, roughness)
    specular = pbr_specular(ks, nrm, wo, wi, roughness * roughness,
                            min_roughness=min_roughness)
    return diffuse + specular


# -------------------------------------------------------------- image loss

def _tonemap_srgb(f):
    return jnp.where(f > 0.0031308,
                     jnp.power(jnp.clip(f, min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
                     12.92 * f)


def image_loss(img, target, loss='l1', tonemapper='none'):
    """Fused tonemap + loss (reference renderutils/loss.py:29-41 /
    CUDA loss.cu:95-137)."""
    if tonemapper == 'log_srgb':
        img = _tonemap_srgb(jnp.log(jnp.clip(img, 0, 65535) + 1))
        target = _tonemap_srgb(jnp.log(jnp.clip(target, 0, 65535) + 1))
    if loss == 'mse':
        return jnp.mean((img - target) ** 2)
    if loss == 'smape':
        nom = jnp.abs(img - target)
        denom = jnp.abs(img) + jnp.abs(target) + 0.01
        return jnp.mean(nom / denom)
    if loss == 'relmse':
        nom = (img - target) ** 2
        denom = img * img + target * target + 0.1
        return jnp.mean(nom / denom)
    return jnp.mean(jnp.abs(img - target))


# --------------------------------------------------------------- transforms

def xfm_points(points: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Batched homogeneous point transform (reference mesh.cu:22-56 /
    ops.py xfm_points): points (B, N, 3), matrix (B, 4, 4) -> (B, N, 4)."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    p = jnp.concatenate([points, ones], axis=-1)
    return jnp.einsum('bnk,bjk->bnj', p, matrix)


def xfm_vectors(vectors: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Direction transform (w=0): vectors (B, N, 3), matrix (B, 4, 4) -> (B, N, 3)."""
    return jnp.einsum('bnk,bjk->bnj', vectors, matrix[..., :3, :3])
