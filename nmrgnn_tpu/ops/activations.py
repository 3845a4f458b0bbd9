"""Activation registry matching the reference's string-keyed activations
(reference: model.py:33-36 — mp_activation in {relu, softplus, tanh},
fc_activation in {relu, softplus})."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "tanh": jnp.tanh,
}


def get_activation(name: Optional[str]) -> Callable:
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; known: {sorted(k for k in _ACTIVATIONS if k)}")
