"""3D U-Net structural tests (tiny configs to keep CPU compiles fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meshdiffusion_tpu.models.unet3d import UNet3D
from meshdiffusion_tpu.models.registry import get_model, create_model
from meshdiffusion_tpu.config import get_config


def tiny_model(**kw):
    defaults = dict(image_size=16, channels=4, nf=32, ch_mult=(1, 2),
                    num_res_blocks=1, attn_resolutions=(8,), dropout=0.0,
                    dtype=jnp.float32)
    defaults.update(kw)
    return UNet3D(**defaults)


@pytest.fixture(scope='module')
def tiny_setup():
    m = tiny_model()
    x = jnp.zeros((2, 16, 16, 16, 4))
    labels = jnp.array([3.0, 500.0])
    mask = jnp.ones((1, 16, 16, 16, 1))
    params = m.init({'params': jax.random.key(0)}, x, labels, mask)
    return m, params, x, labels, mask


def test_forward_shape_and_dtype(tiny_setup):
    m, params, x, labels, mask = tiny_setup
    out = m.apply(params, x, labels, mask)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_zero_init_output_convs(tiny_setup):
    """Output conv and second res-block convs are (near-)zero-initialized, so
    a fresh model's output reduces to contributions of zero-init layers ~ 0."""
    m, params, x, labels, mask = tiny_setup
    out_conv = params['params']['out_conv']['conv']['kernel']
    assert np.abs(np.asarray(out_conv)).max() < 1e-4


def test_mask_layer_contributes(tiny_setup):
    m, params, x, labels, mask = tiny_setup
    out1 = m.apply(params, x, labels, mask)
    out0 = m.apply(params, x, labels, jnp.zeros_like(mask))
    # mask enters via its own stem conv; different masks must change activations
    # somewhere upstream — but the zero-init out_conv may hide it at init.
    # Perturb out_conv to make the difference observable.
    import flax
    p = flax.core.unfreeze(params) if hasattr(params, 'unfreeze') else dict(params)
    kern = p['params']['out_conv']['conv']['kernel']
    p['params']['out_conv']['conv']['kernel'] = jnp.ones_like(kern) * 0.01
    out1 = m.apply(p, x, labels, mask)
    out0 = m.apply(p, x, labels, jnp.zeros_like(mask))
    assert float(jnp.abs(out1 - out0).max()) > 0


def test_res128_level0_quirk():
    """res128 level 0 uses num_res_blocks_first blocks (reference
    ddpm_res128.py:98,118)."""
    m = tiny_model(num_res_blocks=2, num_res_blocks_first=1)
    x = jnp.zeros((1, 16, 16, 16, 4))
    params = m.init({'params': jax.random.key(0)}, x, jnp.array([0.0]),
                    jnp.ones((1, 16, 16, 16, 1)))
    names = set(params['params'].keys())
    assert 'down_0_0' in names and 'down_0_1' not in names
    assert 'down_1_0' in names and 'down_1_1' in names
    # up path gets blocks+1
    assert 'up_0_1' in names and 'up_0_2' not in names
    assert 'up_1_2' in names


def test_registry_and_aliases():
    assert get_model('ddpm_res64') is not None
    assert get_model('ddpm_res128') is not None
    assert get_model('ddpm_res128_v2') is get_model('ddpm_res128')
    with pytest.raises(KeyError):
        get_model('nope')


def test_from_config_res64_shape():
    cfg = get_config('res64')
    model = create_model(cfg)
    assert model.stem_kernel == 3 and model.use_coords
    assert model.ch_mult == (1, 1, 2, 4, 4)
    assert model.num_res_blocks_first is None


def test_from_config_res128_shape():
    cfg = get_config('res128')
    model = create_model(cfg)
    assert model.stem_kernel == 5 and not model.use_coords
    assert model.num_res_blocks_first == 2
    assert model.ch_mult == (1, 1, 2, 4, 4, 4)


def test_timestep_embedding_matches_formula():
    from meshdiffusion_tpu.models.layers import get_timestep_embedding
    t = jnp.array([0.0, 1.0, 999.0])
    emb = get_timestep_embedding(t, 8)
    assert emb.shape == (3, 8)
    half = 4
    freq = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    expect = np.concatenate([np.sin(999.0 * freq), np.cos(999.0 * freq)])
    np.testing.assert_allclose(np.asarray(emb[2]), expect, rtol=1e-5)


def test_bf16_compute_train_grads():
    """bf16 compute path differentiates (the conv transpose dtype pairing
    regression: f32-preferred output with bf16 operands breaks jax.grad)."""
    m = tiny_model(dtype=jnp.bfloat16)
    x = jnp.ones((1, 16, 16, 16, 4))
    labels = jnp.array([1.0])
    mask = jnp.ones((1, 16, 16, 16, 1))
    params = m.init({'params': jax.random.key(0)}, x, labels, mask)

    def loss(p):
        return jnp.sum(m.apply(p, x, labels, mask) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)


def test_conv3d_sum3_variant_matches(monkeypatch):
    """The default sum3 lowering (k shifted 2D convs summed over the
    depth taps) is numerically the taps-concat lowering."""
    from meshdiffusion_tpu.models.layers import Conv3D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)).astype(np.float32))
    m = Conv3D(12, 3)
    p = m.init(jax.random.key(0), x)
    monkeypatch.setenv('MESHDIFFUSION_CONV_IMPL', 'taps')
    y0 = m.apply(p, x)
    monkeypatch.setenv('MESHDIFFUSION_CONV_IMPL', 'sum3')
    y1 = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)
    # grads flow through the shifted-add path too
    g = jax.grad(lambda pp: float(0) + jnp.sum(m.apply(pp, x) ** 2))(p)
    assert all(np.isfinite(np.asarray(l, np.float32)).all()
               for l in jax.tree.leaves(g))


def test_remat_blocks_parity():
    """remat_blocks=True is numerically invisible: identical param tree,
    identical train-mode forward values, and gradients equal to a scaled
    float32 tolerance (remat recomputes the same math, but XLA's changed
    fusion reassociates reductions — observed diffs are ~1e-19 absolute on
    near-zero leaves, i.e. last-ulp noise, not a formula change)."""
    m_plain = tiny_model(remat_blocks=False)
    m_remat = tiny_model(remat_blocks=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 16, 4)).astype(np.float32))
    labels = jnp.array([3.0, 500.0])
    mask = jnp.ones((1, 16, 16, 16, 1))
    p0 = m_plain.init({'params': jax.random.key(0)}, x, labels, mask)
    p1 = m_remat.init({'params': jax.random.key(0)}, x, labels, mask)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))

    def loss(m, p):
        return jnp.sum(m.apply(p, x, labels, mask, train=True) ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(m_plain, p))(p0)
    v1, g1 = jax.value_and_grad(lambda p: loss(m_remat, p))(p1)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    # tolerance is scaled by the GLOBAL gradient magnitude: leaves downstream
    # of zero-init convs carry ~1e-20 denormal noise whose relative error is
    # meaningless (observed 10x on 1e-20 values), while a genuine formula
    # change would show up at the real gradient scale (~0.07 here — small
    # because the zero-init out_conv shrinks the loss)
    gmax = max(float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(g0))
    assert gmax > 1e-3  # the loss actually produces real gradients
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6 * gmax)
