"""Variance-preserving SDE with precomputed discrete tables.

Behavioral counterpart of the reference's ``lib/diffusion/sde_lib.py:176-233``
(VPSDE with a linear beta schedule), re-designed for XLA: every quantity the
sampler or loss needs per-step lives in a precomputed fp32 table so that the
1000-step reverse loop compiles to a single lax.scan over table rows with no
data-dependent control flow.

Tables are built in float64 on host then cast, which is at least as accurate
as the reference's fp32 cumprod.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _build_tables(beta_0: float, beta_1: float, N: int) -> dict:
    betas = np.linspace(beta_0 / N, beta_1 / N, N, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return {
        'discrete_betas': betas.astype(np.float32),
        'alphas': alphas.astype(np.float32),
        'alphas_cumprod': alphas_cumprod.astype(np.float32),
        'sqrt_alphas_cumprod': np.sqrt(alphas_cumprod).astype(np.float32),
        'sqrt_1m_alphas_cumprod': np.sqrt(1.0 - alphas_cumprod).astype(np.float32),
    }


@dataclasses.dataclass(frozen=True)
class VPSDE:
    """Variance-preserving SDE, beta(t) linear in [beta_0, beta_1].

    Discrete tables follow the DDPM convention used by the reference:
    ``discrete_betas = linspace(beta_min/N, beta_max/N, N)``
    (reference sde_lib.py:189).
    """

    beta_min: float = 0.1
    beta_max: float = 20.0
    N: int = 1000

    @property
    def beta_0(self) -> float:
        return self.beta_min

    @property
    def beta_1(self) -> float:
        return self.beta_max

    @property
    def T(self) -> float:
        return 1.0

    # ---- precomputed discrete tables (host-side numpy, fp32) ----

    def _tables(self) -> dict:
        return _build_tables(self.beta_min, self.beta_max, self.N)

    @property
    def discrete_betas(self) -> np.ndarray:
        return self._tables()['discrete_betas']

    @property
    def alphas(self) -> np.ndarray:
        return self._tables()['alphas']

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return self._tables()['alphas_cumprod']

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return self._tables()['sqrt_alphas_cumprod']

    @property
    def sqrt_1m_alphas_cumprod(self) -> np.ndarray:
        return self._tables()['sqrt_1m_alphas_cumprod']

    # ---- continuous-time functions (pure, jit-safe) ----

    def sde(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward drift/diffusion. t: (B,). x: (B, ...)."""
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * _bcast(beta_t, x) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean/std of p_t(x | x_0). Reference sde_lib.py:210-214."""
        coeff, std = self.marginal_coeffs(t)
        return _bcast(coeff, x) * x, std

    def marginal_coeffs(self, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mean coefficient, std) as (B,) vectors — handy for fused samplers."""
        log_mean_coeff = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        coeff = jnp.exp(log_mean_coeff)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return coeff, std

    def prior_logp(self, z: jnp.ndarray) -> jnp.ndarray:
        shape = z.shape
        n = float(np.prod(shape[1:]))
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * np.log(2 * np.pi) - jnp.sum(z ** 2, axis=axes) / 2.0

    def discretize(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DDPM discretization f, G (reference sde_lib.py:225-233)."""
        timestep = self.timestep_of(t)
        beta = jnp.asarray(self.discrete_betas)[timestep]
        alpha = jnp.asarray(self.alphas)[timestep]
        f = _bcast(jnp.sqrt(alpha), x) * x - x
        G = jnp.sqrt(beta)
        return f, G

    def timestep_of(self, t: jnp.ndarray) -> jnp.ndarray:
        """Continuous t in [0, T] -> integer table index (torch .long() trunc)."""
        return (t * (self.N - 1) / self.T).astype(jnp.int32)

    def timesteps(self, eps: float = 1e-3) -> np.ndarray:
        """The reverse-time grid linspace(T, eps, N) used by all samplers."""
        return np.linspace(self.T, eps, self.N, dtype=np.float64).astype(np.float32)


def _bcast(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape a (B,) vector for broadcasting against (B, ...) data."""
    return v.reshape(v.shape + (1,) * (like.ndim - v.ndim))
