"""Debug/observability helpers: NaN tripwires and profiler traces.

Counterparts of the reference's implicit validation machinery: the
``torch.is_anomaly_enabled()`` finite-checks inside every renderutils
wrapper (reference renderutils/ops.py:109-110 etc.), the NaN raises in the
shader (render.py:116-122), and the per-iteration timing/profile hooks
(fit_dmtets.py:518-531).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

_ANOMALY = [False]


def set_detect_anomaly(enabled: bool) -> None:
    """Global switch like torch.autograd.set_detect_anomaly."""
    _ANOMALY[0] = enabled


def anomaly_enabled() -> bool:
    return _ANOMALY[0] or os.environ.get('MESHDIFFUSION_DETECT_ANOMALY') == '1'


def check_finite(tree: Any, name: str = 'tensor') -> Any:
    """When anomaly detection is on, halt with an error if any leaf is
    non-finite (in-jit via checkify-style debug callback; identity
    otherwise)."""
    if not anomaly_enabled():
        return tree

    def _chk(x):
        if isinstance(x, (jnp.ndarray, jax.Array)):
            ok = jnp.isfinite(x).all()

            def _raise(ok_val):
                if not ok_val:
                    raise FloatingPointError(f'non-finite values in {name}')
            jax.debug.callback(_raise, ok)
        return x

    return jax.tree.map(_chk, tree)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info('profiler trace written to %s', log_dir)


class StepTimer:
    """Per-iteration wall-clock averaging with remaining-time display
    (reference fit_dmtets.py:518-531)."""

    def __init__(self, total_iters: int, window: int = 10):
        self.total = total_iters
        self.window = window
        self.durations = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, it: int) -> str:
        self.durations.append(time.time() - self._t0)
        recent = self.durations[-self.window:]
        avg = sum(recent) / len(recent)
        remaining = (self.total - it) * avg
        return f'{avg * 1000:.1f} ms/iter, rem={_fmt_time(remaining)}'


def _fmt_time(seconds: float) -> str:
    if seconds > 3600:
        return f'{seconds / 3600:.1f} h'
    if seconds > 60:
        return f'{seconds / 60:.1f} min'
    return f'{seconds:.1f} s'
