"""Sampler tests with a tiny analytic 'model' (no U-Net) so the full scan
logic — tables, masking, conditioning — is exercised cheaply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meshdiffusion_tpu.diffusion.vpsde import VPSDE
from meshdiffusion_tpu.diffusion import sampling


SHAPE = (2, 8, 8, 8, 4)


def zero_model(x, labels):
    return jnp.zeros_like(x)


@pytest.fixture(scope='module')
def sde():
    return VPSDE(beta_max=2.0, N=20)


def grid_mask():
    m = np.ones((1, 8, 8, 8, 1), np.float32)
    m[:, :2] = 0.0
    return jnp.asarray(m)


def test_step_tables_consistency(sde):
    t = sampling.StepTables.build(sde)
    assert t.t.shape == (sde.N,)
    np.testing.assert_allclose(t.labels, t.t * (sde.N - 1), rtol=1e-6)
    idx = (t.t.astype(np.float64) * (sde.N - 1)).astype(np.int64)
    np.testing.assert_allclose(t.beta, sde.discrete_betas[idx], rtol=1e-6)
    np.testing.assert_allclose(t.inv_sqrt_1m_beta,
                               1 / np.sqrt(1 - sde.discrete_betas[idx]), rtol=1e-5)


def test_uncond_pc_shapes_and_mask(sde):
    gm = grid_mask()
    sampler = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm)
    out, nfe = jax.jit(lambda k: sampler(zero_model, k))(jax.random.key(0))
    assert out.shape == SHAPE
    assert nfe == sde.N * 2
    # masked region stays exactly zero through all steps
    assert float(jnp.abs(out[:, :2]).max()) == 0.0
    assert float(jnp.abs(out[:, 2:]).max()) > 0.0


def test_uncond_deterministic_in_key(sde):
    sampler = sampling.get_pc_sampler(sde, SHAPE, grid_mask=grid_mask())
    o1, _ = sampler(zero_model, jax.random.key(7))
    o2, _ = sampler(zero_model, jax.random.key(7))
    o3, _ = sampler(zero_model, jax.random.key(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0


def test_ancestral_matches_manual_loop(sde):
    """The fused scan reproduces a step-by-step python loop bit-for-bit-ish."""
    gm = grid_mask()
    tables = sampling.StepTables.build(sde)
    key = jax.random.key(3)

    # manual loop with the same RNG consumption pattern
    k = key
    k, pkey = jax.random.split(k)
    x = jax.random.normal(pkey, SHAPE) * gm
    for i in range(sde.N - 1):
        k, ck, pk = jax.random.split(k, 3)
        row = tables.row(i)
        labels = jnp.full((SHAPE[0],), row['labels'])
        eps_hat = zero_model(x, labels)
        score = -eps_hat / row['std']
        x_mean = (x + row['beta'] * score) * row['inv_sqrt_1m_beta']
        noise = jax.random.normal(pk, x.shape)
        x = (x_mean + row['sqrt_beta'] * noise) * gm
        x_mean = x_mean * gm
    expected = x_mean

    sampler = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm)
    out, _ = sampler(zero_model, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=1e-5)


def test_cond_imposes_partial(sde):
    gm = jnp.ones((1, 8, 8, 8, 1), jnp.float32)
    partial = jnp.ones((1, 8, 8, 8, 1), jnp.float32) * 0.5
    pmask = np.zeros((1, 8, 8, 8, 1), np.float32)
    pmask[:, 4:] = 1.0
    pmask = jnp.asarray(pmask)
    sampler = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm)
    out, _ = sampler(zero_model, jax.random.key(0), partial=partial,
                     partial_mask=pmask, freeze_iters=sde.N - 2)
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()
    # at the last frozen step the SDF channel inside the mask was replaced by
    # noised partial at a low noise level; it should correlate with 0.5
    inmask = np.asarray(out)[:, 4:, :, :, 0]
    assert abs(inmask.mean() - 0.5) < 0.2


def test_correctors_run(sde):
    gm = grid_mask()
    lin_model = lambda x, labels: 0.1 * x  # nonzero grads for langevin snr math
    for corr in ('langevin', 'ald'):
        sampler = sampling.get_pc_sampler(sde, SHAPE, corrector=corr,
                                          snr=0.075, n_steps=1, grid_mask=gm)
        out, _ = sampler(lin_model, jax.random.key(0))
        assert np.isfinite(np.asarray(out)).all()


def test_other_predictors_run(sde):
    gm = grid_mask()
    for pred in ('euler_maruyama', 'reverse_diffusion', 'none'):
        sampler = sampling.get_pc_sampler(sde, SHAPE, predictor=pred,
                                          grid_mask=gm)
        out, _ = sampler(zero_model, jax.random.key(0))
        assert np.isfinite(np.asarray(out)).all()


def test_ddim_runs(sde):
    gm = grid_mask()
    for schedule in ('uniform', 'quad'):
        sampler = sampling.get_ddim_sampler(sde, SHAPE, grid_mask=gm,
                                            schedule=schedule, num_steps=5)
        out, _ = sampler(zero_model, jax.random.key(0))
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()
        assert float(jnp.abs(out[:, :2]).max()) == 0.0


def test_return_traj(sde):
    gm = grid_mask()
    sampler = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm,
                                      return_traj=True, traj_start=10,
                                      traj_every=2)
    traj, _ = sampler(zero_model, jax.random.key(0))
    n_expected = (sde.N - 1 - 10 + 1) // 2
    assert traj.shape[0] == n_expected
    assert np.isfinite(np.asarray(traj)).all()


def test_config_driven_factory(sde):
    from meshdiffusion_tpu.config import get_config
    cfg = get_config('res64')
    sampler = sampling.get_sampling_fn(cfg, sde, SHAPE, grid_mask=grid_mask())
    out, _ = sampler(zero_model, jax.random.key(0))
    assert out.shape == SHAPE


def test_segmented_matches_fused(sde):
    """Chunked host-dispatched sampling is bit-identical to the fused scan."""
    gm = grid_mask()
    s_fused = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm)
    s_seg = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm,
                                    segment_steps=7)  # 19 steps -> 3 segments
    o1, _ = s_fused(zero_model, jax.random.key(5))
    o2, _ = s_seg(zero_model, jax.random.key(5))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    partial = jnp.ones((1, 8, 8, 8, 1)) * 0.5
    pmask = jnp.ones((1, 8, 8, 8, 1))
    c1, _ = s_fused(zero_model, jax.random.key(6), partial=partial,
                    partial_mask=pmask, freeze_iters=10)
    c2, _ = s_seg(zero_model, jax.random.key(6), partial=partial,
                  partial_mask=pmask, freeze_iters=10)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_params_threading(sde):
    """params passed explicitly match a closure model."""
    gm = grid_mask()
    w = jnp.asarray(0.25)
    closure = lambda x, labels: w * x
    threaded = lambda p, x, labels: p * x
    s_seg = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm, segment_steps=8)
    o1, _ = s_seg(closure, jax.random.key(4))
    o2, _ = s_seg(threaded, jax.random.key(4), params=w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
