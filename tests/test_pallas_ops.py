"""Pallas kernels vs jnp oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.ops import (ancestral_update,
                                   ancestral_update_reference,
                                   fused_groupnorm_silu,
                                   groupnorm_silu_reference)


def test_ancestral_update_matches_oracle(rng):
    shape = (2, 8, 8, 8, 4)
    x = rng.normal(size=shape).astype(np.float32)
    eps_hat = rng.normal(size=shape).astype(np.float32)
    noise = rng.normal(size=shape).astype(np.float32)
    mask = (rng.random((1, 8, 8, 8, 1)) > 0.3).astype(np.float32)
    beta = jnp.asarray(0.0123)
    std = jnp.asarray(0.87)
    ref_x, ref_m = ancestral_update_reference(
        jnp.asarray(x), jnp.asarray(eps_hat), jnp.asarray(mask),
        jnp.asarray(noise), beta, std)
    got_x, got_m = ancestral_update(
        jnp.asarray(x), jnp.asarray(eps_hat), jnp.asarray(mask),
        jnp.asarray(noise), beta, std, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               rtol=1e-6, atol=1e-6)


def test_groupnorm_silu_matches_oracle(rng):
    B, S, C, G = 2, 6 * 6 * 6, 64, 32
    x = rng.normal(size=(B, 6, 6, 6, C)).astype(np.float32)
    scale = rng.normal(size=(C,)).astype(np.float32)
    bias = rng.normal(size=(C,)).astype(np.float32)
    ref = groupnorm_silu_reference(jnp.asarray(x), jnp.asarray(scale),
                                   jnp.asarray(bias), num_groups=G)
    got = fused_groupnorm_silu(jnp.asarray(x), jnp.asarray(scale),
                               jnp.asarray(bias), num_groups=G, block=64,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_groupnorm_silu_ragged_tail(rng):
    """rows not divisible by block exercises the validity mask."""
    B, C, G = 1, 32, 8
    x = rng.normal(size=(B, 5, 5, 3, C)).astype(np.float32)  # 75 rows
    scale = np.ones(C, np.float32)
    bias = np.zeros(C, np.float32)
    ref = groupnorm_silu_reference(jnp.asarray(x), jnp.asarray(scale),
                                   jnp.asarray(bias), num_groups=G)
    got = fused_groupnorm_silu(jnp.asarray(x), jnp.asarray(scale),
                               jnp.asarray(bias), num_groups=G, block=32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_groupnorm_matches_flax_groupnorm(rng):
    """Cross-check the oracle itself against flax's GroupNorm + silu."""
    import flax.linen as nn
    B, C, G = 2, 64, 32
    x = rng.normal(size=(B, 4, 4, 4, C)).astype(np.float32)
    scale = rng.normal(size=(C,)).astype(np.float32)
    bias = rng.normal(size=(C,)).astype(np.float32)
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-6)
    params = {'params': {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)}}
    want = nn.silu(gn.apply(params, jnp.asarray(x)))
    got = groupnorm_silu_reference(jnp.asarray(x), jnp.asarray(scale),
                                   jnp.asarray(bias), num_groups=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_gn_resblock_parity(rng):
    """fused_gn=True block: identical param tree + numerics vs flax GN."""
    import jax.tree_util as jtu
    from meshdiffusion_tpu.models.layers import ResnetBlockDDPM
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 64)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    m0 = ResnetBlockDDPM(out_ch=64, temb_dim=128, dropout=0.0)
    m1 = ResnetBlockDDPM(out_ch=64, temb_dim=128, dropout=0.0, fused_gn=True)
    p = m0.init(jax.random.key(0), x, temb)
    p1 = m1.init(jax.random.key(0), x, temb)
    assert jtu.tree_structure(p) == jtu.tree_structure(p1)
    o0 = m0.apply(p, x, temb)
    o1 = m1.apply(p, x, temb)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
