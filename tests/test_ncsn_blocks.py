"""NCSN legacy block shape/sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.models import ncsn_blocks as NB


def test_crp_rcu_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 16)).astype(np.float32))
    for M in (NB.CRPBlock(16), NB.RCUBlock(16)):
        p = M.init(jax.random.key(0), x)
        out = M.apply(p, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_msf_fuses_scales(rng):
    a = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 32)).astype(np.float32))
    M = NB.MSFBlock(24)
    p = M.init(jax.random.key(0), [a, b], (8, 8, 8))
    out = M.apply(p, [a, b], (8, 8, 8))
    assert out.shape == (1, 8, 8, 8, 24)


def test_refine_block(rng):
    a = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 16)).astype(np.float32))
    M = NB.RefineBlock(16, end=True)
    p = M.init(jax.random.key(0), [a, b], (8, 8, 8))
    out = M.apply(p, [a, b], (8, 8, 8))
    assert out.shape == (1, 8, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pooled_convs(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)).astype(np.float32))
    for M in (NB.ConvMeanPool(12), NB.MeanPoolConv(12)):
        p = M.init(jax.random.key(0), x)
        out = M.apply(p, x)
        assert out.shape == (1, 8, 4, 4, 12)
