"""Multi-process (multi-host) runtime initialization and data feed.

The reference only ever stubs DDP (NCCL ``init_process_group`` at
nvdiffrec/fit_dmtets.py:602-611, whose sole consumer raises
``NotImplementedError``). The TPU-native story is the standard JAX one:

* every process calls ``jax.distributed.initialize`` (coordinator address +
  process id), after which ``jax.devices()`` is the GLOBAL device list and
  jitted computations are single-program-multiple-data across hosts;
* each process feeds only its local slice of the global batch;
  ``jax.make_array_from_process_local_data`` assembles the global array on
  the ('data', 'spatial') mesh — gradients still psum under jit, now over
  ICI + DCN;
* checkpointing stays orbax (it coordinates across processes natively).

Launch contract (documented in README): run one process per host with
  MESHDIFFUSION_COORDINATOR=host0:1234
  MESHDIFFUSION_NUM_PROCESSES=N
  MESHDIFFUSION_PROCESS_ID=<0..N-1>
or pass the same values explicitly to ``maybe_initialize``. Single-process
runs are untouched (the function is a no-op without the env/args).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when a multi-process launch is
    requested via args or MESHDIFFUSION_* env vars. Must run before the
    first device use. Returns True iff multi-process mode is active."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = coordinator or os.environ.get('MESHDIFFUSION_COORDINATOR', '')
    if num_processes is None:
        num_processes = int(os.environ.get('MESHDIFFUSION_NUM_PROCESSES', '0') or 0)
    if process_id is None:
        pid = os.environ.get('MESHDIFFUSION_PROCESS_ID', '')
        process_id = int(pid) if pid != '' else None
    if not coordinator or num_processes <= 1 or process_id is None:
        return False

    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    logger.info('distributed runtime up: process %d/%d, %d global devices',
                process_id, num_processes, jax.device_count())
    return True


def process_local_batch_size(global_batch: int) -> int:
    """The per-process share of a global batch; errors on indivisibility."""
    import jax
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f'global batch {global_batch} not divisible by process count {n}')
    return global_batch // n


def form_global_batch(local_batch, sharding):
    """Assemble this process's local slice into a global sharded array.
    Single-process: plain device_put."""
    import jax
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
