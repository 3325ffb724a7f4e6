"""Log-likelihood (bits/dim) via the probability-flow ODE.

Counterpart of reference ``lib/diffusion/likelihood.py:26-113``. TPU-native
design: the drift + Hutchinson divergence evaluation is ONE jitted function
using ``jax.jvp`` (forward-mode — one extra network pass, cheaper than the
reference's backward-mode autograd.grad); the adaptive RK45 controller stays
on host via scipy exactly like the reference.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import integrate

from .vpsde import VPSDE


def get_drift_fn(sde: VPSDE, model_fn: Callable) -> Callable:
    """Probability-flow ODE drift: f - 0.5 g^2 * score.

    model_fn(x, labels) is the epsilon network; score = -eps_hat/std with
    std from the continuous marginal (labels = t*(N-1), reference
    models/utils.py:191-198 keyed into the discrete table).
    """
    s1m = jnp.asarray(sde.sqrt_1m_alphas_cumprod)

    def drift(x, t):
        beta_t = sde.beta_0 + t * (sde.beta_1 - sde.beta_0)
        labels = t * (sde.N - 1)
        std = s1m[labels.astype(jnp.int32)]
        eps_hat = model_fn(x, labels)
        score = -eps_hat / std.reshape((-1,) + (1,) * (x.ndim - 1))
        f = -0.5 * beta_t.reshape((-1,) + (1,) * (x.ndim - 1)) * x
        return f - 0.5 * beta_t.reshape((-1,) + (1,) * (x.ndim - 1)) * score

    return drift


def get_likelihood_fn(sde: VPSDE, model_fn: Callable,
                      hutchinson_type: str = 'Rademacher',
                      rtol: float = 1e-5, atol: float = 1e-5,
                      method: str = 'RK45', eps: float = 1e-5,
                      inverse_scaler=None):
    """Returns likelihood_fn(key, data) -> (bpd, z, nfe).

    data: (B, R, R, R, C) channels-last.
    """
    drift_fn = get_drift_fn(sde, model_fn)

    @jax.jit
    def drift_and_div(x, t, noise):
        def f(xx):
            return drift_fn(xx, t)
        drift, jvp = jax.jvp(f, (x,), (noise,))
        div = jnp.sum(jvp * noise, axis=tuple(range(1, x.ndim)))
        return drift, div

    def likelihood_fn(key: jax.Array, data: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
        data = np.asarray(data, np.float32)
        shape = data.shape
        B = shape[0]
        if hutchinson_type == 'Gaussian':
            epsilon = jax.random.normal(key, shape)
        elif hutchinson_type == 'Rademacher':
            epsilon = jax.random.rademacher(key, shape).astype(jnp.float32)
        else:
            raise NotImplementedError(f"Hutchinson type {hutchinson_type} unknown.")

        def ode_func(t, x_flat):
            sample = jnp.asarray(x_flat[:-B].reshape(shape), jnp.float32)
            vec_t = jnp.full((B,), t, jnp.float32)
            drift, div = drift_and_div(sample, vec_t, epsilon)
            return np.concatenate([np.asarray(drift).reshape(-1),
                                   np.asarray(div)], axis=0)

        init = np.concatenate([data.reshape(-1), np.zeros((B,))], axis=0)
        solution = integrate.solve_ivp(ode_func, (eps, sde.T), init,
                                       rtol=rtol, atol=atol, method=method)
        nfe = solution.nfev
        zp = solution.y[:, -1]
        z = zp[:-B].reshape(shape).astype(np.float32)
        delta_logp = zp[-B:].astype(np.float32)
        prior_logp = np.asarray(sde.prior_logp(jnp.asarray(z)))
        bpd = -(prior_logp + delta_logp) / np.log(2)
        N = np.prod(shape[1:])
        bpd = bpd / N
        inv = inverse_scaler or (lambda x: x)
        offset = 7.0 - inv(-1.0)
        return bpd + offset, z, nfe

    return likelihood_fn
