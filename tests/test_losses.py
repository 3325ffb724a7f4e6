"""Loss / train-step / EMA tests (tiny linear stand-in model where possible)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.config import get_config
from meshdiffusion_tpu.diffusion import losses as L
from meshdiffusion_tpu.diffusion.vpsde import VPSDE


class TinyNet(nn.Module):
    """1x1-conv epsilon model with the same call signature as UNet3D."""

    @nn.compact
    def __call__(self, x, labels, mask=None, *, train=False):
        return nn.Conv(4, (1, 1, 1), name='c')(x)


def make_setup(iter_size=1, mask=None):
    cfg = get_config('res64')
    cfg.optim.warmup = 2
    cfg.optim.lr = 1e-2
    model = TinyNet()
    sde = VPSDE(beta_max=2.0, N=10)
    x = jnp.zeros((1, 4, 4, 4, 4))
    params = model.init(jax.random.key(0), x, jnp.zeros((1,)))
    tx = L.get_optimizer(cfg)
    state = L.TrainState.create(params, tx, jax.random.key(1))
    step = L.make_train_step(model, sde, tx, mask, ema_decay=0.999,
                             iter_size=iter_size)
    return state, step


def test_train_step_runs_and_counts():
    state, step = make_setup()
    batch = jnp.ones((1, 2, 4, 4, 4, 4))  # (iter_size, B, ...)
    jit_step = jax.jit(step)
    state2, metrics = jit_step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics['loss']))
    # warmup lr is 0 at step 0 (reference losses.py:45-47 semantics);
    # params move from the second step on
    state3, _ = jit_step(state2, batch)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state2.params, state3.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_gradient_accumulation_runs():
    """iter_size=2 consumes a (2, B, ...) batch in one optimizer step."""
    state, step2 = make_setup(iter_size=2)
    mb = jnp.ones((1, 4, 4, 4, 4))
    batch2 = jnp.stack([mb, mb])  # (2, 1, 4, 4, 4, 4)
    s2, metrics = step2(state, batch2)
    assert int(s2.step) == 1
    assert np.isfinite(float(metrics['loss']))


def test_ema_update_math():
    p = {'w': jnp.ones(3)}
    e = {'w': jnp.zeros(3)}
    new_e, n = L.ema_update(e, p, jnp.zeros((), jnp.int32), decay=0.9999)
    # n=1 -> d = min(0.9999, 2/11)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(new_e['w']), 1 - d, rtol=1e-6)
    assert int(n) == 1


def test_masked_loss_weighting():
    """Masked loss equals mean(losses*mask) * numel/mask.sum()
    (reference losses.py:75-78)."""
    sde = VPSDE(beta_max=2.0, N=10)
    mask = np.zeros((1, 4, 4, 4, 1), np.float32)
    mask[0, :2] = 1.0

    def apply_fn(params, x, labels, m, train, rngs):
        return jnp.zeros_like(x)

    batch = jnp.ones((2, 4, 4, 4, 4))
    labels = jnp.array([3, 7])
    noise = jnp.ones_like(batch) * 2.0
    loss = L.ddpm_loss(apply_fn, {}, batch, labels, noise,
                       jnp.asarray(sde.sqrt_alphas_cumprod),
                       jnp.asarray(sde.sqrt_1m_alphas_cumprod),
                       jnp.asarray(mask), 'l2', train=False)
    # eps_hat = 0 -> losses = noise^2 = 4 everywhere; masked mean per sample
    # = 4 * mask.sum*C/(total) ... net: mean(losses*mask)*numel/mask.sum = 4
    np.testing.assert_allclose(float(loss), 4.0, rtol=1e-5)


def test_eval_step_uses_ema():
    state, _ = make_setup()
    model = TinyNet()
    sde = VPSDE(beta_max=2.0, N=10)
    ev = L.make_eval_step(model, sde, None)
    out = ev(state, jnp.ones((2, 4, 4, 4, 4)), jax.random.key(0))
    assert np.isfinite(float(out['loss']))


def test_warmup_schedule():
    cfg = get_config('res64')
    cfg.optim.warmup = 10
    cfg.optim.lr = 1.0
    tx = L.get_optimizer(cfg)
    # indirectly: two steps with same grads -> updates scale with warmup
    params = {'w': jnp.zeros(2)}
    st = tx.init(params)
    g = {'w': jnp.ones(2)}
    up1, st = tx.update(g, st, params)  # step 0: lr = 0
    up2, st = tx.update(g, st, params)  # step 1: lr = 0.1
    up3, st = tx.update(g, st, params)  # step 2: lr = 0.2
    assert float(jnp.abs(up1['w']).max()) == 0.0
    r = float(up3['w'][0] / up2['w'][0])
    assert 1.5 < r < 2.5
