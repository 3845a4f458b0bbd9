"""Masked losses keyed by atom-name indices.

Functional JAX port of the reference loss semantics (reference:
losses.py:4-39). Labels come as ``y[N, 3] = (shift, name_idx, weight)``
(reference: main.py:27-33; SURVEY.md Appendix B): an atom contributes to
the loss iff its weight flag is nonzero AND its name index is in the
selected label set.

    loss = s * L2_masked + (1 - s) * (1 - pearson_r_masked)

``corr_coeff`` clips the variance product into [0, 1e32] (reference
losses.py:14) — the metric variant deliberately does not (quirk C9).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _divide_no_nan(num, den):
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)


def corr_coeff(x, y, w=None, clip: bool = True):
    """Weighted Pearson correlation (reference losses.py:4-15)."""
    if w is None:
        w = jnp.ones_like(x)
    m = jnp.sum(w)
    xm = _divide_no_nan(jnp.sum(w * x), m)
    ym = _divide_no_nan(jnp.sum(w * y), m)
    xm2 = _divide_no_nan(jnp.sum(w * x * x), m)
    ym2 = _divide_no_nan(jnp.sum(w * y * y), m)
    cov = jnp.sum(w * (x - xm) * (y - ym))
    var_prod = (xm2 - xm * xm) * (ym2 - ym * ym)
    if clip:
        var_prod = jnp.clip(var_prod, 0.0, 1e32)
    return _divide_no_nan(cov, m * jnp.sqrt(var_prod))


def label_mask(y_true, label_idx):
    """f32 mask: weight flag * membership of name_idx in label_idx
    (reference losses.py:33-34). ``label_idx`` is a static int sequence."""
    ln = jnp.asarray(np.asarray(label_idx, np.int32))
    name = y_true[..., 1].astype(jnp.int32)
    member = jnp.any(name[..., None] == ln, axis=-1)
    return y_true[..., -1] * member.astype(jnp.float32)


def name_loss(y_true, y_pred, label_idx, s: float = 1.0):
    """NameLoss (reference losses.py:17-39). y_true f32[..., 3], y_pred
    f32[...]; reduces over all leading axes (flattened batch)."""
    w = label_mask(y_true, label_idx)
    x = y_pred
    y = y_true[..., 0]
    l2 = _divide_no_nan(jnp.sum(w * (y - x) ** 2), jnp.sum(w))
    r = corr_coeff(x, y, w, clip=True)
    return l2 * s + (1.0 - s) * (1.0 - r)
