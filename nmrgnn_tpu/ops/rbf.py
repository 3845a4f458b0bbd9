"""Radial basis function expansion of distances (SchNet-style).

Reference semantics (reference: layers.py:102-140): centers are
``linspace(low, high, count)``, gap is ``centers[1] - centers[0]`` and the
expansion is ``exp(-(d - mu)^2 / gap)`` — note the division is by the
*gap*, not gap squared, exactly as in the reference (layers.py:137-140).

Stateless: centers/gap are compile-time constants folded by XLA, so the
whole expansion fuses into the surrounding elementwise graph.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rbf_centers(low: float, high: float, count: int) -> np.ndarray:
    return np.linspace(low, high, count, dtype=np.float32)


def rbf_expand(distances: jnp.ndarray, low: float, high: float, count: int) -> jnp.ndarray:
    """Expand [...]-shaped distances into [..., count] RBF features."""
    centers = jnp.asarray(rbf_centers(low, high, count))
    gap = centers[1] - centers[0]
    d = distances[..., None] - centers
    return jnp.exp(-(d * d) / gap)
