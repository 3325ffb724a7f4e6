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


def test_segment_compile_reuse(sde):
    """Repeated sampler calls must not re-trace the segment function —
    round 1 jitted a fresh lambda per call (VERDICT item 10)."""
    gm = grid_mask()
    traces = []

    def counting_model(p, x, labels):
        traces.append(1)
        return jnp.zeros_like(x)

    s = sampling.get_pc_sampler(sde, SHAPE, grid_mask=gm, segment_steps=7)
    w = jnp.zeros(())
    s(counting_model, jax.random.key(0), params=w)
    n1 = len(traces)
    assert n1 > 0
    s(counting_model, jax.random.key(1), params=w)
    assert len(traces) == n1, "second uncond call re-traced the segment fn"

    partial = jnp.ones((1, 8, 8, 8, 1)) * 0.5
    pmask = jnp.ones((1, 8, 8, 8, 1))
    s(counting_model, jax.random.key(2), partial=partial,
      partial_mask=pmask, freeze_iters=10, params=w)
    n2 = len(traces)
    # new partial VALUES and a new freeze_iters reuse the same compile
    s(counting_model, jax.random.key(3), partial=partial * 0.2,
      partial_mask=pmask, freeze_iters=5, params=w)
    assert len(traces) == n2, "new conditioning inputs re-traced the segment fn"


def test_ddim_compile_reuse(sde):
    gm = grid_mask()
    traces = []

    def counting_model(p, x, labels):
        traces.append(1)
        return jnp.zeros_like(x)

    s = sampling.get_ddim_sampler(sde, SHAPE, grid_mask=gm, num_steps=5)
    w = jnp.zeros(())
    s(counting_model, jax.random.key(0), params=w)
    n1 = len(traces)
    s(counting_model, jax.random.key(1), params=w)
    assert len(traces) == n1


def test_ddim_matches_fp64_oracle(sde):
    """The reference computes the DDIM update in float64
    (reference sde_lib.py:125-139); our fp32 scan must track an fp64 numpy
    oracle of the same recursion within tight drift."""
    c = 0.3
    model = lambda x, labels: c * x          # deterministic 'network'
    num_steps = 10

    ts = sampling.ddim_schedule(sde, 'uniform', num_steps).astype(np.float64)
    t_seq = ts[1:][::-1]
    tprev_seq = ts[:-1][::-1]
    N = sde.N
    sqrt_ac = sde.sqrt_alphas_cumprod.astype(np.float64)
    sqrt_1m = sde.sqrt_1m_alphas_cumprod.astype(np.float64)

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)

    x = x0.astype(np.float64)
    for t, tp in zip(t_seq, tprev_seq):
        i = min(max(int(t * (N - 1)), 0), N - 1)
        ip = min(max(int(tp * (N - 1)), 0), N - 1)
        a1, a2 = sqrt_ac[i], sqrt_1m[i]
        a1p, a2p = sqrt_ac[ip], sqrt_1m[ip]
        eps = c * x
        x0ps = x - a2 * eps
        sst = x - x0ps
        x = (a1p / a1) * x + (-(a1p / a1) + (a2p / a2)) * sst
    oracle = x

    sampler = sampling.get_ddim_sampler(sde, SHAPE, denoise=False,
                                        schedule='uniform',
                                        num_steps=num_steps)
    out, _ = sampler(model, jax.random.key(0), x0=jnp.asarray(x0))
    drift = np.abs(np.asarray(out, np.float64) - oracle).max()
    assert drift < 5e-5, f"fp32 DDIM drift vs fp64 oracle: {drift}"
