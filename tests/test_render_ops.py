"""Shading-op parity vs the reference's python oracles (the reference's own
test pattern: CUDA-vs-python golden equivalence, renderutils/tests/*.py —
here jnp-vs-torch-oracle, values AND gradients)."""

import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference repo not mounted')


@pytest.fixture(scope='module')
def oracle():
    sys.path.insert(0, os.path.join(REFERENCE, 'nvdiffrec'))
    import importlib
    mod = importlib.import_module('lib.render.renderutils.bsdf')
    loss_mod = importlib.import_module('lib.render.renderutils.loss')
    sys.path.pop(0)
    return mod, loss_mod


def rand(shape, rng):
    return rng.normal(size=shape).astype(np.float32)


def compare_with_grads(jax_fn, torch_fn, inputs, rng, grad_idx=None, rtol=1e-4):
    """Run both, compare outputs and input-gradients of sum(out * target)."""
    import jax
    import jax.numpy as jnp
    import torch

    target = rng.normal(size=np.asarray(jax_fn(*inputs)).shape).astype(np.float32)

    j_out = np.asarray(jax_fn(*[jnp.asarray(x) for x in inputs]))
    t_in = [torch.tensor(x, requires_grad=True) for x in inputs]
    t_out = torch_fn(*t_in)
    np.testing.assert_allclose(j_out, t_out.detach().numpy(),
                               rtol=rtol, atol=1e-5)

    grad_idx = grad_idx if grad_idx is not None else range(len(inputs))

    def j_loss(*args):
        return jnp.sum(jax_fn(*args) * jnp.asarray(target))

    j_grads = jax.grad(j_loss, argnums=tuple(grad_idx))(
        *[jnp.asarray(x) for x in inputs])
    torch.sum(t_out * torch.tensor(target)).backward()
    for gi, jg in zip(grad_idx, j_grads):
        np.testing.assert_allclose(np.asarray(jg), t_in[gi].grad.numpy(),
                                   rtol=rtol, atol=1e-4,
                                   err_msg=f'grad of input {gi}')


def test_lambert(oracle, rng):
    bsdf, _ = oracle
    from meshdiffusion_tpu.render import ops
    nrm = rand((4, 8, 3), rng)
    wi = rand((4, 8, 3), rng)
    compare_with_grads(ops.lambert, bsdf.bsdf_lambert, [nrm, wi], rng)


def test_fresnel_ndf_lambda_smith(oracle, rng):
    bsdf, _ = oracle
    from meshdiffusion_tpu.render import ops
    a = np.abs(rand((16, 1), rng)) * 0.5 + 0.01
    c = rng.uniform(0.01, 0.99, (16, 1)).astype(np.float32)
    c2 = rng.uniform(0.01, 0.99, (16, 1)).astype(np.float32)
    f0 = np.abs(rand((16, 1), rng))
    f90 = np.abs(rand((16, 1), rng))
    compare_with_grads(ops.fresnel_shlick, bsdf.bsdf_fresnel_shlick,
                       [f0, f90, c], rng)
    compare_with_grads(ops.ndf_ggx, bsdf.bsdf_ndf_ggx, [a, c], rng)
    compare_with_grads(ops.lambda_ggx, bsdf.bsdf_lambda_ggx, [a, c], rng)
    compare_with_grads(ops.masking_smith,
                       bsdf.bsdf_masking_smith_ggx_correlated,
                       [a, c, c2], rng)


def test_frostbite(oracle, rng):
    bsdf, _ = oracle
    from meshdiffusion_tpu.render import ops
    nrm, wi, wo = rand((8, 3), rng), rand((8, 3), rng), rand((8, 3), rng)
    r = rng.uniform(0.05, 1.0, (8, 1)).astype(np.float32)
    compare_with_grads(ops.frostbite_diffuse, bsdf.bsdf_frostbite,
                       [nrm, wi, wo, r], rng)


def test_pbr_specular_and_bsdf(oracle, rng):
    bsdf, _ = oracle
    from meshdiffusion_tpu.render import ops
    col = np.abs(rand((2, 16, 3), rng))
    nrm = rand((2, 16, 3), rng)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    wo = rand((2, 16, 3), rng); wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi = rand((2, 16, 3), rng); wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    alpha = rng.uniform(0.01, 1.0, (2, 16, 1)).astype(np.float32)
    compare_with_grads(ops.pbr_specular, bsdf.bsdf_pbr_specular,
                       [col, nrm, wo, wi, alpha], rng)

    kd = np.abs(rand((2, 16, 3), rng))
    arm = rng.uniform(0, 1, (2, 16, 3)).astype(np.float32)
    arm[..., 0] = 0.0
    pos = rand((2, 16, 3), rng)
    view_pos = pos + rand((2, 16, 3), rng)
    light_pos = pos + rand((2, 16, 3), rng)

    def j_fn(kd, arm, pos, nrm, vp, lp):
        return ops.pbr_bsdf(kd, arm, pos, nrm, vp, lp, 0.08, 'lambert')

    def t_fn(kd, arm, pos, nrm, vp, lp):
        return bsdf.bsdf_pbr(kd, arm, pos, nrm, vp, lp, 0.08, 0)

    compare_with_grads(j_fn, t_fn, [kd, arm, pos, nrm, view_pos, light_pos],
                       rng, rtol=5e-4)


def test_prepare_shading_normal(oracle, rng):
    bsdf, _ = oracle
    from meshdiffusion_tpu.render import ops
    shape = (2, 8, 8, 3)
    pos = rand(shape, rng)
    view_pos = pos + rand(shape, rng)
    pn = rand(shape, rng) * 0.2 + np.array([0, 0, 1.0], np.float32)
    sn = rand(shape, rng)
    st = rand(shape, rng)
    gn = rand(shape, rng)
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)

    def j_fn(pos, vp, pn, sn, st, gn):
        return ops.prepare_shading_normal(pos, vp, pn, sn, st, gn, True, True)

    def t_fn(pos, vp, pn, sn, st, gn):
        return bsdf.bsdf_prepare_shading_normal(pos, vp, pn, sn, st, gn,
                                                True, True)

    compare_with_grads(j_fn, t_fn, [pos, view_pos, pn, sn, st, gn], rng,
                       rtol=5e-4)


def test_image_loss(oracle, rng):
    _, loss_mod = oracle
    from meshdiffusion_tpu.render import ops
    img = np.abs(rand((2, 16, 16, 3), rng))
    tgt = np.abs(rand((2, 16, 16, 3), rng))
    import torch
    for loss in ('l1', 'mse', 'smape', 'relmse'):
        for tm in ('none', 'log_srgb'):
            j = float(ops.image_loss(img, tgt, loss, tm))
            t = float(loss_mod.image_loss_fn(torch.tensor(img),
                                             torch.tensor(tgt), loss, tm))
            np.testing.assert_allclose(j, t, rtol=1e-5,
                                       err_msg=f'{loss}/{tm}')


def test_xfm_points_vectors(rng):
    from meshdiffusion_tpu.render import ops
    import jax.numpy as jnp
    pts = rand((2, 10, 3), rng)
    mtx = rand((2, 4, 4), rng)
    out = np.asarray(ops.xfm_points(jnp.asarray(pts), jnp.asarray(mtx)))
    # oracle: plain matmul of homogeneous coords
    ph = np.concatenate([pts, np.ones((2, 10, 1), np.float32)], axis=-1)
    expect = np.einsum('bnk,bjk->bnj', ph, mtx)
    np.testing.assert_allclose(out, expect, rtol=1e-5)
    vec = np.asarray(ops.xfm_vectors(jnp.asarray(pts), jnp.asarray(mtx)))
    expect_v = np.einsum('bnk,bjk->bnj', pts, mtx[:, :3, :3])
    np.testing.assert_allclose(vec, expect_v, rtol=1e-5)
