"""High-level library API — the user-facing entry points mirroring the
reference's nmrgnn.library (reference: library.py): load_model,
universe2graph, check_peaks, plus native save/load of our checkpoints.
"""
from __future__ import annotations

import json
import os
import warnings
from typing import Optional, Tuple

import jax
import numpy as np

from .config import ModelConfig
from .data.embeddings import load_standards
from .data.parse import structure2graph
from .graph import Graph
from .models import gnn

BASELINE_DIR = os.path.join(os.path.dirname(__file__), "models", "baseline")


def setup_optimizations(debug_nans: bool = False, enable_x64: bool = False) -> None:
    """Runtime-optimization toggles (reference: library.py:12-19 turns on
    TF XLA jit; under JAX everything is jit-compiled already). Exposes
    the numerics-checking mode the reference left commented out
    (library.py:13) as the debug_nans flag."""
    import jax

    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if enable_x64:
        jax.config.update("jax_enable_x64", True)


def load_baseline() -> str:
    """Path of the bundled pretrained model directory (reference:
    library.py:22-27)."""
    return BASELINE_DIR


def build_GNNModel(
    config: Optional[ModelConfig] = None,
    metrics: bool = True,
    loss_balance: float = 1.0,
    rng=None,
):
    """(params, Trainer) — migration-friendly equivalent of the reference
    model factory (reference: model.py:12-105): initialized parameters
    plus a Trainer wired with Adam, NameLoss(loss_balance) and the
    standard 15-metric suite."""
    import jax

    from .config import TrainConfig
    from .train.trainer import Trainer

    config = config or ModelConfig()
    trainer = Trainer(config, TrainConfig(loss_balance=loss_balance))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    from .models import gnn

    params = gnn.init_params(rng, config, load_standards())
    return params, trainer


def load_data(tfrecords, validation: float, embeddings=None, scale: bool = False):
    """(train_samples, validation_samples) with the reference's per-file
    take/skip split semantics (reference: library.py:50-89). ``scale`` is
    accepted for API parity; the reference's scaling branch is dead code
    (quirk C5) and labels are already in real ppm units."""
    from .data.dataset import split_dataset

    train, val = split_dataset(list(tfrecords), validation)
    return train, val


def save_model(path: str, params, config: ModelConfig) -> None:
    """Serialize params (flax msgpack) + config (JSON sidecar).

    Replaces the reference's Keras SavedModel round-trip
    (reference: main.py:82, library.py:101-102) — and unlike the
    reference's broken get_config path (SURVEY.md C6), peak standards
    serialize with the params pytree."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(config.to_json())


def load_model(model_file: Optional[str] = None) -> Tuple[dict, ModelConfig]:
    """Load (params, config). With no argument, loads the bundled baseline
    (reference: library.py:92-103). Raises FileNotFoundError if the
    baseline has not been trained/installed yet."""
    from flax import serialization

    path = model_file or BASELINE_DIR
    cfg_file = os.path.join(path, "config.json")
    params_file = os.path.join(path, "params.msgpack")
    if not os.path.exists(params_file):
        raise FileNotFoundError(
            f"no model found at {path}; train one with `nmrgnn-tpu train` "
            "or pass an explicit model directory"
        )
    with open(cfg_file) as f:
        config = ModelConfig.from_json(f.read())
    template = gnn.init_params(jax.random.PRNGKey(0), config, load_standards())
    with open(params_file, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return params, config


def universe2graph(struct_or_path, neighbor_number: int = 16) -> Graph:
    """Structure (file path or parsed Structure) -> graph tuple
    (atoms, nlist, edges, inv_degree) — reference library.py:106-117."""
    return structure2graph(struct_or_path, neighbor_number)


def check_peaks(atoms, peaks, cutoff_sigma: float = 4, warn_sigma: float = 2.5):
    """Sanity-check predicted peaks against training shift statistics
    (reference: library.py:30-47). Returns bool[N] 'confident'. Raises
    Warning (as an exception — matching the reference's behavior, quirk
    C8) when fewer than 75% of atoms look plausible.

    ``cutoff_sigma`` is accepted for signature parity only: the
    reference's NaN-ing cutoff branch is commented out in its source
    (reference library.py:38-40), so the parameter is deliberately
    unused there and here."""
    standards = load_standards()
    atoms = np.asarray(atoms)
    peaks = np.asarray(peaks)
    elem_idx = np.argmax(atoms, axis=-1)
    avg = np.asarray([standards[int(i)][1] for i in range(atoms.shape[-1])])
    std = np.asarray([standards[int(i)][2] for i in range(atoms.shape[-1])])
    a = avg[elem_idx]
    s = std[elem_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        z2 = np.where(s > 0, ((peaks - a) ** 2) / np.maximum(s, 1e-30) ** 2, np.inf)
    confident = (s > 0) & (z2 <= warn_sigma**2)
    if np.sum(confident) / max(len(confident), 1) < 0.75:
        raise Warning(
            "Your peaks look awful. Likely solvent or missing hydrogens or "
            "bad units. Check README for suggestions"
        )
    return confident
