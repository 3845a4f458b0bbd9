"""Hyperparameter search: random sampling over the reference's HP space
with successive halving (a native, dependency-free replacement for the
reference's kerastuner Hyperband, reference: main.py:317-328).

Search space matches reference model.py:22-45.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import ModelConfig, TrainConfig
from ..data.dataset import split_dataset
from ..data.embeddings import load_embeddings
from .trainer import Trainer

SEARCH_SPACE = {
    "atom_feature_size": [32, 64, 128, 256],
    "edge_feature_size": [1, 2, 3, 8, 64],
    "edge_hidden_size": [16, 32, 64, 128, 256],
    "mp_layers": [1, 2, 3, 4, 5, 6],
    "fc_layers": [2, 3, 4, 5, 6],
    "edge_fc_layers": [2, 3, 4, 5, 6],
    "noise": [0.0, 0.025, 0.05, 0.1],
    "dropout": [True, False],
    "mp_activation": ["relu", "softplus", "tanh"],
    "fc_activation": ["relu", "softplus"],
    "learning_rate": [1e-3, 5e-4, 1e-4, 1e-5],
}


def sample_config(rng: np.random.Generator) -> ModelConfig:
    kw = {k: v[rng.integers(len(v))] for k, v in SEARCH_SPACE.items()}
    # numpy scalars -> python types for JSON round-trip
    kw = {
        k: (bool(v) if isinstance(v, np.bool_) else
            int(v) if isinstance(v, np.integer) else
            float(v) if isinstance(v, np.floating) else v)
        for k, v in kw.items()
    }
    return ModelConfig(**kw)


def run_hyper(
    tfrecords: List[str],
    epochs: int = 3,
    validation: float = 0.1,
    trials: int = 8,
    tuning_path: str = "tuning",
    seed: int = 0,
    embeddings_path: Optional[str] = None,
    pad_to: int = 256,
    batch_size: int = 8,
    verbose: bool = True,
) -> ModelConfig:
    """Successive halving: train all sampled configs for a rung of epochs,
    keep the best half, repeat until one remains (or epochs exhausted).
    Returns the best config; writes results + best_config.json."""
    os.makedirs(tuning_path, exist_ok=True)
    emb = load_embeddings(embeddings_path)
    rng = np.random.default_rng(seed)
    train_s, val_s = split_dataset(tfrecords, validation)
    if not val_s:
        split = max(1, len(train_s) // 10)
        val_s, train_s = train_s[:split], train_s[split:]

    candidates: List[Tuple[ModelConfig, object, Trainer]] = []
    for _ in range(trials):
        cfg = sample_config(rng)
        tcfg = TrainConfig(validation=validation, pad_to=pad_to, batch_size=batch_size)
        candidates.append([cfg, None, Trainer(cfg, tcfg, emb)])

    results = []
    rung = 0
    rung_epochs = max(1, epochs // 3)
    while len(candidates) > 1:
        scored = []
        for entry in candidates:
            cfg, state, trainer = entry
            state = trainer.fit(
                train_s, val_s, epochs=rung_epochs, state=state, verbose=False,
                early_stop_patience=5,  # reference main.py:298-304
            )
            entry[1] = state
            vl = state.history["val_loss"][-1]
            scored.append((vl, entry))
            results.append({"rung": rung, "val_loss": float(vl), "config": json.loads(cfg.to_json())})
            if verbose:
                print(f"rung {rung}: val_loss={vl:.4g} {cfg.atom_feature_size}F/{cfg.mp_layers}mp lr={cfg.learning_rate}")
        scored.sort(key=lambda t: (np.isnan(t[0]), t[0]))
        keep = max(1, len(scored) // 2)
        candidates = [e for _, e in scored[:keep]]
        rung += 1

    best_cfg, best_state, best_trainer = candidates[0]
    # post-search fit: the full epoch budget with the plateau schedule,
    # like the reference's longer final training run (main.py:331-339),
    # early-stopped on validation
    best_state = best_trainer.fit(
        train_s, val_s, epochs=epochs, state=best_state, verbose=False,
        early_stop_patience=5,
    )
    with open(os.path.join(tuning_path, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    with open(os.path.join(tuning_path, "best_config.json"), "w") as f:
        f.write(best_cfg.to_json())
    from ..library import save_model

    save_model(
        os.path.join(tuning_path, "best_model"), best_state.eval_params, best_cfg
    )
    return best_cfg
