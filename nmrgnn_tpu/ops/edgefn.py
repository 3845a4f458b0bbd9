"""Closed-form compression of the edge stage for serving.

The reference's entire edge stage — RBF expansion followed by the EdgeFC
MLP (reference: layers.py:102-140, model.py:110-144) — maps a SCALAR
distance to E edge channels:

    e(d) = EdgeFC(RBF(d)) : R -> R^E

On TPU the exact stage is transcendental-bound: at 2,560 atoms x K=16 it
evaluates ~5M exp (RBF) plus ~10M softplus (hidden layers) per forward,
~150 us on v5e — the single largest cost of the banded fast path. Since
e is a smooth 1-D function (a fixed composition of Gaussians and smooth
MLP layers), serving compresses it once per model into a Chebyshev
polynomial per channel, fit against the exact network on a dense grid,
then evaluated with an FMA-only recurrence inside the band-build kernel
(ops/banded.py build_band_poly). Beyond ``d_hi`` every RBF bump has
decayed to ~0 so e is constant; distances are clamped into the fitted
domain, preserving that plateau. Accuracy (measured against the exact
network on a 20k-point grid, baseline weights): the shipped degree-64
fit reproduces the exact stage to ~1e-6 max absolute error — the f32
floor (degree 48 measures the same ~1e-6; raising the degree does not
improve it) and far tighter than the bf16 arithmetic it feeds.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class EdgeCheb(NamedTuple):
    """Chebyshev model of the edge stage: coefficients are in the
    Chebyshev basis on [d_lo, d_hi]; evaluate with clamped input."""

    coeffs: np.ndarray  # f32[degree + 1, E]
    d_lo: float
    d_hi: float

    @property
    def degree(self) -> int:
        return self.coeffs.shape[0] - 1


def exact_edge_fn(d: np.ndarray, edge_fc_params, *, rbf_low: float,
                  rbf_high: float, rbf_count: int, activation: str) -> np.ndarray:
    """The exact edge stage on host numpy (float64): RBF -> EdgeFC.
    Returns [len(d), E]. Mirrors models/gnn.apply's edge stage
    (reference model.py:254-261) without the padding mask."""
    act = {
        "softplus": lambda x: np.logaddexp(0.0, x),
        "relu": lambda x: np.maximum(x, 0.0),
        "tanh": np.tanh,
        "linear": lambda x: x,
        None: lambda x: x,
    }[activation]
    centers = np.linspace(rbf_low, rbf_high, rbf_count, dtype=np.float32)
    gap = float(centers[1] - centers[0])
    x = np.exp(-((d[:, None].astype(np.float64) - centers) ** 2) / gap)
    for i, p in enumerate(edge_fc_params):
        k = np.asarray(p["kernel"], np.float64)
        x = x @ k
        if "bias" in p:
            x = x + np.asarray(p["bias"], np.float64)
        if i < len(edge_fc_params) - 1:
            x = act(x)
    return x


def fit_edge_chebyshev(
    edge_fc_params,
    *,
    rbf_low: float,
    rbf_high: float,
    rbf_count: int,
    activation: str = "softplus",
    degree: int = 96,
    d_lo: float = 0.0,
    d_hi: float = None,
    n_samples: int = 8192,
) -> EdgeCheb:
    """Fit e(d) on [d_lo, d_hi]. ``d_hi`` defaults to the distance past
    which every RBF center has decayed below ~1e-7 (sqrt(16*gap) past
    rbf_high), where e is constant — clamping larger d is then exact."""
    if d_hi is None:
        gap = (rbf_high - rbf_low) / (rbf_count - 1)
        d_hi = rbf_high + float(np.sqrt(16.0 * gap))
    d = np.linspace(d_lo, d_hi, n_samples)
    y = exact_edge_fn(
        d, edge_fc_params,
        rbf_low=rbf_low, rbf_high=rbf_high, rbf_count=rbf_count,
        activation=activation,
    )
    # chebfit wants x in [-1, 1]
    x = 2.0 * (d - d_lo) / (d_hi - d_lo) - 1.0
    coeffs = np.polynomial.chebyshev.chebfit(x, y, degree)
    return EdgeCheb(
        coeffs=np.ascontiguousarray(coeffs, np.float32),
        d_lo=float(d_lo), d_hi=float(d_hi),
    )


def eval_edge_chebyshev_device(cheb: EdgeCheb, d):
    """Device (jnp) evaluation via the Clenshaw recurrence — FMA-only,
    transcendental-free. Used by the attention serving fast path, whose
    [N, K]-sized edge stage runs in XLA rather than inside the band
    kernel. Returns e[..., E]; the caller applies the padding mask."""
    import jax.numpy as jnp

    x = jnp.clip(
        2.0 * (jnp.clip(d, cheb.d_lo, cheb.d_hi) - cheb.d_lo)
        / (cheb.d_hi - cheb.d_lo) - 1.0,
        -1.0, 1.0,
    )
    c = jnp.asarray(cheb.coeffs)  # [degree + 1, E]
    b1 = jnp.zeros(x.shape + (c.shape[1],), x.dtype)
    b2 = jnp.zeros_like(b1)
    x2 = (2.0 * x)[..., None]
    for k in range(c.shape[0] - 1, 0, -1):
        b1, b2 = c[k] + x2 * b1 - b2, b1
    return c[0] + x[..., None] * b1 - b2


def eval_edge_chebyshev(cheb: EdgeCheb, d: np.ndarray) -> np.ndarray:
    """Reference evaluation (numpy) incl. the clamp; for tests."""
    x = np.clip(
        2.0 * (np.clip(d, cheb.d_lo, cheb.d_hi) - cheb.d_lo)
        / (cheb.d_hi - cheb.d_lo) - 1.0,
        -1.0, 1.0,
    )
    return np.polynomial.chebyshev.chebval(x, cheb.coeffs.astype(np.float64)).T
