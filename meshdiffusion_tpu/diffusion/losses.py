"""DDPM loss, optimizer factory, and the jitted train step.

Behavioral counterpart of the reference ``lib/diffusion/losses.py``
(Adam factory:26-35, warmup+clip optimization_manager:38-52, masked DDPM
epsilon-loss:54-85, step fn:87-141), re-designed for TPU:

* optimizer = optax chain: global-norm clip -> Adam with a linear-warmup
  schedule — the same math as the reference's manual lr mutation + clip.
* gradient accumulation (``iter_size``, reference trainer.py:94-116) is a
  ``lax.scan`` over a leading microbatch axis inside ONE jitted step, with
  gradients SUMMED across microbatches exactly like repeated
  ``loss.backward()`` calls (the reference compensates via lr, see
  configs/res128.py:57).
* the EMA update is a fused tree-map on device (reference models/ema.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .vpsde import VPSDE


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray                    # int32 scalar; counts optimizer steps
    params: Any
    opt_state: Any
    ema_params: Any
    ema_num_updates: jnp.ndarray         # int32 scalar
    rng: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng: jax.Array):
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   opt_state=tx.init(params),
                   ema_params=jax.tree.map(jnp.copy, params),
                   ema_num_updates=jnp.zeros((), jnp.int32),
                   rng=rng)


def get_optimizer(config) -> optax.GradientTransformation:
    """Adam + linear warmup + global-norm clip (reference losses.py:26-52)."""
    if config.optim.optimizer != 'Adam':
        raise NotImplementedError(f'Optimizer {config.optim.optimizer} not supported yet!')
    warmup = config.optim.warmup
    base_lr = config.optim.lr

    def schedule(step):
        if warmup > 0:
            return base_lr * jnp.minimum(step / warmup, 1.0)
        return base_lr

    parts = []
    if config.optim.grad_clip >= 0:
        parts.append(optax.clip_by_global_norm(config.optim.grad_clip))
    parts.append(optax.adam(learning_rate=schedule, b1=config.optim.beta1,
                            b2=0.999, eps=config.optim.eps))
    if config.optim.weight_decay:
        parts.insert(0, optax.add_decayed_weights(config.optim.weight_decay))
    return optax.chain(*parts)


def ema_update(ema_params, params, num_updates, decay: float):
    """Shadow-param EMA with warmup decay min(decay, (1+n)/(10+n))
    (reference models/ema.py:43-51)."""
    n = num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree.map(lambda s, p: s - (1.0 - d) * (s - p), ema_params, params)
    return new_ema, n


def ddpm_loss(apply_fn: Callable, params, batch: jnp.ndarray,
              labels: jnp.ndarray, noise: jnp.ndarray,
              sqrt_ac: jnp.ndarray, sqrt_1m_ac: jnp.ndarray,
              mask: Optional[jnp.ndarray], loss_type: str = 'l2',
              train: bool = True, dropout_rng: Optional[jax.Array] = None
              ) -> jnp.ndarray:
    """Masked epsilon-prediction loss (reference losses.py:54-85).

    batch: (B, R, R, R, C) channels-last; mask: (1, R, R, R, 1) or None.
    """
    a = sqrt_ac[labels][:, None, None, None, None]
    s = sqrt_1m_ac[labels][:, None, None, None, None]
    perturbed = a * batch + s * noise
    if mask is not None:
        perturbed = perturbed * mask
    rngs = {'dropout': dropout_rng} if (train and dropout_rng is not None) else None
    eps_hat = apply_fn(params, perturbed, labels.astype(jnp.float32), mask,
                       train=train, rngs=rngs)
    if loss_type == 'l2':
        losses = jnp.square(eps_hat - noise)
    elif loss_type == 'l1':
        losses = jnp.abs(eps_hat - noise)
    else:
        raise NotImplementedError(loss_type)
    if mask is not None:
        losses = losses * mask
        per_sample = jnp.mean(losses.reshape(losses.shape[0], -1), axis=-1)
        # reweight by mask density: x prod(mask.size)/mask.sum()
        # (reference losses.py:78; mask numel is R^3 in both layouts)
        scale = np.prod(mask.shape) / jnp.sum(mask)
        return jnp.mean(per_sample) * scale
    per_sample = jnp.mean(losses.reshape(losses.shape[0], -1), axis=-1)
    return jnp.mean(per_sample)


def make_train_step(model, sde: VPSDE, tx: optax.GradientTransformation,
                    mask: Optional[jnp.ndarray], loss_type: str = 'l2',
                    ema_decay: float = 0.9999, iter_size: int = 1):
    """Build the jittable train step.

    The incoming batch has shape (iter_size, micro_bs, R, R, R, C); gradients
    are summed over the leading axis inside a lax.scan, then one optimizer
    step + one EMA update are applied — semantics identical to the reference's
    inner accumulation loop (trainer.py:94-116) at 1/iter_size the dispatches.
    """
    sqrt_ac = jnp.asarray(sde.sqrt_alphas_cumprod)
    sqrt_1m_ac = jnp.asarray(sde.sqrt_1m_alphas_cumprod)
    N = sde.N

    def apply_fn(params, x, labels, mask, train, rngs):
        return model.apply(params, x, labels, mask, train=train, rngs=rngs)

    def micro_loss(params, microbatch, rng):
        rng_t, rng_n, rng_d = jax.random.split(rng, 3)
        B = microbatch.shape[0]
        labels = jax.random.randint(rng_t, (B,), 0, N)
        noise = jax.random.normal(rng_n, microbatch.shape, dtype=jnp.float32)
        return ddpm_loss(apply_fn, params, microbatch, labels, noise,
                         sqrt_ac, sqrt_1m_ac, mask, loss_type,
                         train=True, dropout_rng=rng_d)

    grad_fn = jax.value_and_grad(micro_loss)

    def train_step(state: TrainState, batch: jnp.ndarray
                   ) -> Tuple[TrainState, dict]:
        rng, new_rng = jax.random.split(state.rng)

        def scan_body(carry, microbatch):
            grads_acc, loss_acc, rng = carry
            rng, sub = jax.random.split(rng)
            loss, grads = grad_fn(state.params, microbatch, sub)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, rng), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum, _), _ = jax.lax.scan(
            scan_body, (zero_grads, jnp.zeros(()), rng), batch)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema, n = ema_update(state.ema_params, new_params,
                                state.ema_num_updates, ema_decay)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, ema_params=new_ema,
                                  ema_num_updates=n, rng=new_rng)
        metrics = {'loss': loss_sum / batch.shape[0]}
        return new_state, metrics

    return train_step


def make_eval_step(model, sde: VPSDE, mask: Optional[jnp.ndarray],
                   loss_type: str = 'l2'):
    """Eval-mode loss using EMA params (reference losses.py:129-135)."""
    sqrt_ac = jnp.asarray(sde.sqrt_alphas_cumprod)
    sqrt_1m_ac = jnp.asarray(sde.sqrt_1m_alphas_cumprod)
    N = sde.N

    def apply_fn(params, x, labels, mask, train, rngs):
        return model.apply(params, x, labels, mask, train=False)

    def eval_step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        rng_t, rng_n = jax.random.split(rng)
        B = batch.shape[0]
        labels = jax.random.randint(rng_t, (B,), 0, N)
        noise = jax.random.normal(rng_n, batch.shape, dtype=jnp.float32)
        loss = ddpm_loss(apply_fn, state.ema_params, batch, labels, noise,
                         sqrt_ac, sqrt_1m_ac, mask, loss_type, train=False)
        return {'loss': loss}

    return eval_step
