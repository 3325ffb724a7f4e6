"""Device mesh and sharding layout.

The reference's only real parallelism is single-process
``torch.nn.DataParallel`` (reference models/utils.py:94-95) plus an unused
NCCL DDP stub (fit_dmtets.py:602-611). The TPU-native replacement:

* a ``jax.sharding.Mesh`` with axes ``('data', 'spatial')``;
* batches sharded over ``data`` (gradients psum'd by XLA under jit);
* for res128-scale activations, the grid's leading spatial dim is sharded
  over ``spatial`` — XLA SPMD inserts halo exchanges for the 3x3x3 convs
  automatically (the 'context parallel'-shaped axis this framework adds,
  SURVEY.md section 2d);
* parameters and the grid mask are replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'spatial') mesh. data=-1 -> all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial == n, f"mesh {data}x{spatial} != {n} devices"
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ('data', 'spatial'))


def data_spec(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for (B, D, H, W, C) batches: B over 'data', optionally D over
    'spatial'."""
    dims = [None] * 5
    dims[0] = 'data'
    if spatial_dim is not None and mesh.shape['spatial'] > 1:
        dims[spatial_dim] = 'spatial'
    return NamedSharding(mesh, P(*dims))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Place a host (B, D, H, W, C) array onto the mesh."""
    spec = data_spec(mesh, 1 if spatial else None)
    return jax.device_put(batch, spec)
