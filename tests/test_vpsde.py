"""VPSDE table and marginal math tests (oracle: independent numpy formulas
matching reference lib/diffusion/sde_lib.py:176-233)."""

import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.diffusion.vpsde import VPSDE


def test_tables_match_reference_formulas():
    sde = VPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    betas = np.linspace(0.1 / 1000, 20.0 / 1000, 1000)
    np.testing.assert_allclose(sde.discrete_betas, betas, rtol=1e-6)
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sde.alphas_cumprod, ac, rtol=1e-5)
    np.testing.assert_allclose(sde.sqrt_alphas_cumprod, np.sqrt(ac), rtol=1e-5)
    np.testing.assert_allclose(sde.sqrt_1m_alphas_cumprod, np.sqrt(1 - ac), rtol=1e-5)


def test_marginal_prob_consistent_with_discrete_tables():
    """At t = i/(N-1), exp marginal coeff ~ sqrt(alphas_cumprod[i])."""
    sde = VPSDE()
    i = np.array([10, 100, 500, 999])
    t = i / (sde.N - 1)
    coeff, std = sde.marginal_coeffs(jnp.asarray(t, jnp.float32))
    # continuous-vs-discrete agreement is approximate (same in the reference);
    # relative gaps grow where the coefficient itself vanishes
    np.testing.assert_allclose(np.asarray(coeff), sde.sqrt_alphas_cumprod[i],
                               rtol=5e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(std), sde.sqrt_1m_alphas_cumprod[i],
                               rtol=5e-2, atol=2e-2)


def test_sde_drift_diffusion():
    sde = VPSDE()
    x = jnp.ones((2, 3, 3, 3, 4))
    t = jnp.array([0.0, 1.0])
    drift, diff = sde.sde(x, t)
    assert drift.shape == x.shape
    np.testing.assert_allclose(np.asarray(drift)[0], -0.5 * 0.1 * 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(diff), np.sqrt([0.1, 20.0]), rtol=1e-6)


def test_discretize_matches_tables():
    sde = VPSDE()
    x = jnp.ones((1, 2, 2, 2, 4))
    t = jnp.array([0.5])
    f, G = sde.discretize(x, t)
    idx = int(0.5 * (sde.N - 1))
    beta = sde.discrete_betas[idx]
    np.testing.assert_allclose(np.asarray(G), np.sqrt(beta), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f)[0, 0, 0, 0, 0],
                               np.sqrt(1 - beta) - 1, rtol=1e-5)


def test_prior_logp_standard_normal():
    sde = VPSDE()
    z = jnp.zeros((2, 4, 4, 4, 4))
    lp = sde.prior_logp(z)
    n = 4 * 4 * 4 * 4
    np.testing.assert_allclose(np.asarray(lp), -n / 2 * np.log(2 * np.pi), rtol=1e-6)


def test_timesteps_grid():
    sde = VPSDE(N=100)
    ts = sde.timesteps(1e-3)
    assert ts.shape == (100,)
    assert ts[0] == 1.0 and abs(ts[-1] - 1e-3) < 1e-6
