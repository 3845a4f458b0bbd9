"""Name-keyed evaluation metrics (functional).

Port of the reference metric family (reference: metrics.py:5-116):
``type_mask`` resolves an atom-name regex to vocabulary indices; the
metric functions compute masked RMSD / Pearson r / counts over
``y[..., 3] = (shift, name_idx, weight)`` labels.

The reference metric objects overwrite state per batch (quirk C3); here
metrics are pure functions of (y_true, y_pred) — epoch aggregation is
the trainer's responsibility, which accumulates sums not last-batch
values (a deliberate fix over the reference).

Per quirk C9 the Pearson here does NOT clip the variance product.
"""
from __future__ import annotations

import re
from typing import Dict, List, Sequence

import jax.numpy as jnp

from .losses import _divide_no_nan, corr_coeff, label_mask


def type_mask(label_name: str, embeddings: dict, regex: bool = False) -> List[int]:
    """Resolve a label name (or regex over names) to vocabulary indices
    (reference metrics.py:5-19). Raises ValueError on no regex match."""
    if regex:
        m = re.compile(label_name)
        ln = [v for k, v in embeddings["name"].items() if m.match(k)]
        if not ln:
            raise ValueError("Regular expression did not match any embeddings")
        return ln
    return [embeddings["name"][label_name]]


def name_rmsd(y_true, y_pred, label_idx):
    """Masked RMSD (with sqrt — reference metrics.py:36-42)."""
    w = label_mask(y_true, label_idx)
    diff = (y_true[..., 0] - y_pred) ** 2 * w
    return jnp.sqrt(_divide_no_nan(jnp.sum(diff), jnp.sum(w)))


def name_corr(y_true, y_pred, label_idx):
    """Masked Pearson r (reference metrics.py:92-116; no variance clip)."""
    w = label_mask(y_true, label_idx)
    return corr_coeff(y_true[..., 0], y_pred, w, clip=False)


def name_count(y_true, y_pred, label_idx):
    """Number of selected labeled atoms (reference metrics.py:64-69)."""
    return jnp.sum(label_mask(y_true, label_idx))


# The 15 compiled metrics of the reference model (reference model.py:56-104):
# masked RMSD + r for H/N/C/HN/HA name groups and r+count for the organic
# MB / DFT classes.
METRIC_SPECS = (
    ("h_rmsd", name_rmsd, r".*\-H.*"),
    ("n_rmsd", name_rmsd, r".*\-N.*"),
    ("c_rmsd", name_rmsd, r".*\-C.*"),
    ("hn_rmsd", name_rmsd, r".*\-H$"),
    ("ha_rmsd", name_rmsd, r".*\-HA*"),
    ("h_r", name_corr, r".*\-H.*"),
    ("n_r", name_corr, r".*\-N.*"),
    ("c_r", name_corr, r".*\-C.*"),
    ("hn_r", name_corr, r".*\-H$"),
    ("ha_r", name_corr, r".*\-HA.*"),
    ("avg_ha_count", name_count, r".*\-HA.*"),
    ("mb_r", name_corr, r"MB.*"),
    ("avg_mb_count", name_count, r"MB.*"),
    ("dft_r", name_corr, r"DFT.*"),
    ("avg_dft_count", name_count, r"DFT.*"),
)


def build_metric_fns(embeddings: dict) -> Dict[str, callable]:
    """Instantiate the standard metric suite against a vocabulary.

    Regexes that match nothing in the vocabulary are skipped (the
    reference would raise at model build; our vocab includes MB/DFT so
    all 15 resolve by default)."""
    out = {}
    for name, fn, pattern in METRIC_SPECS:
        try:
            idx = tuple(type_mask(pattern, embeddings, regex=True))
        except ValueError:
            continue
        out[name] = (lambda f, i: lambda yt, yp: f(yt, yp, i))(fn, idx)
    return out
