"""Model registry (behavioral parity with reference models/utils.py:24-96)."""

from __future__ import annotations

from typing import Callable, Dict

_MODELS: Dict[str, Callable] = {}


def register_model(cls=None, *, name: str = None):
    def _register(cls):
        local_name = cls.__name__ if name is None else name
        if local_name in _MODELS:
            raise ValueError(f'Already registered model with name: {local_name}')
        _MODELS[local_name] = cls
        return cls

    return _register if cls is None else _register(cls)


def register_alias(name: str, target: str) -> None:
    """Register an extra name for an existing model (used to fix the
    reference's 'ddpm_res128_v2' config/registry mismatch)."""
    _MODELS[name] = _MODELS[target]


def get_model(name: str):
    try:
        return _MODELS[name]
    except KeyError as e:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(_MODELS)}") from e


def create_model(config):
    """Instantiate the flax module for ``config.model.name``.

    Counterpart of reference models/utils.py:88-96 — no DataParallel wrapper;
    replication/sharding is handled by jax.sharding at call sites.
    """
    return get_model(config.model.name).from_config(config)
