"""Orbax-based checkpointing of the TrainState.

Counterpart of the reference's torch pickles of {optimizer, model, ema, step}
(reference lib/diffusion/utils.py:6-30), with the same tolerant semantics:
restoring from a missing path warns and returns the input state unchanged
(reference utils.py:8-13). Numbered snapshots + a rolling preemption
checkpoint mirror trainer.py:122-130.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(directory: str, state, step: Optional[int] = None,
                    max_to_keep: Optional[int] = None) -> None:
    step = int(state.step) if step is None else int(step)
    with _manager(directory, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def restore_checkpoint(directory: str, state, step: Optional[int] = None):
    """Restore into the structure of ``state``; missing dir -> warn + passthrough."""
    if not os.path.isdir(directory):
        logging.warning("No checkpoint found at %s. Returned the same state as input",
                        directory)
        return state
    with _manager(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            logging.warning("No checkpoint steps in %s. Returned the same state as input",
                            directory)
            return state
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
