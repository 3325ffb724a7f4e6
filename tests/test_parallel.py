"""Mesh/sharding helper tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meshdiffusion_tpu.parallel import make_mesh, shard_batch, replicate, data_spec


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(data=-1, spatial=2)
    assert dict(m.shape) == {'data': 4, 'spatial': 2}
    m = make_mesh(data=8, spatial=1)
    assert dict(m.shape) == {'data': 8, 'spatial': 1}
    with pytest.raises(AssertionError):
        make_mesh(data=3, spatial=2)


def test_shard_batch_layout():
    mesh = make_mesh(data=-1, spatial=2)
    x = np.arange(8 * 4 * 4 * 4 * 2, dtype=np.float32).reshape(8, 4, 4, 4, 2)
    y = shard_batch(x, mesh, spatial=True)
    # each device holds (2, 2, 4, 4, 2): B/4 x D/2
    shard_shapes = {s.data.shape for s in y.addressable_shards}
    assert shard_shapes == {(2, 2, 4, 4, 2)}
    np.testing.assert_array_equal(np.asarray(y), x)


def test_replicated_params_and_psum_grads():
    """A sharded-batch jitted loss produces replicated grads (XLA psum)."""
    mesh = make_mesh(data=8, spatial=1)
    w = jax.device_put(jnp.ones((2, 2)), replicate(mesh))
    x = shard_batch(np.ones((8, 4, 4, 4, 2), np.float32), mesh)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(jax.grad(loss))(w, x)
    assert np.isfinite(np.asarray(g)).all()
    # gradient is replicated on all devices
    assert len({s.device for s in g.addressable_shards}) == 8
    vals = [np.asarray(s.data) for s in g.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_allclose(v, vals[0], rtol=1e-6)
