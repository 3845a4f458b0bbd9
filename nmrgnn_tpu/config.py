"""Typed model / training configuration.

This replaces the reference's kerastuner ``HyperParameters`` object
(reference: model.py:22-45) with a frozen dataclass so configs are
hashable (usable as jit static args) and serializable to JSON.

Defaults reproduce the shipped baseline model's hyperparameters
(reference: model.py:22-36, optimizer lr at model.py:44-45).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of the GNN chemical-shift model.

    Field names intentionally match the reference hyperparameter names so
    that configs round-trip between the two worlds.
    """

    atom_feature_size: int = 256
    edge_feature_size: int = 3
    edge_hidden_size: int = 128
    mp_layers: int = 4
    fc_layers: int = 4
    edge_fc_layers: int = 4
    noise: float = 0.025
    dropout: bool = True
    rbf_low: float = 0.005
    rbf_high: float = 0.20
    mp_activation: str = "softplus"
    fc_activation: str = "softplus"
    learning_rate: float = 1e-4
    # Number of element classes (one-hot width of `atoms`); the bundled
    # baseline model uses 10 (reference: SavedModel serving signature,
    # input_1 f32[-1,10]).
    num_elements: int = 10
    # Neighbors per atom (K). Baseline uses 16 (reference: library.py:106).
    neighbor_number: int = 16
    # Dropout rate applied after the FC block (reference: model.py:217).
    dropout_rate: float = 0.2
    # Compute dtype for matmul-heavy ops. f32 matches the reference; bf16
    # is the TPU-native fast path (MXU-friendly) with f32 accumulation.
    compute_dtype: str = "float32"
    # Which message-passing implementation to use:
    #   "gather"      — jnp.take + einsum (XLA; reference semantics)
    #   "blocksparse" — Pallas block-sparse adjacency SpMM (TPU fast path)
    mp_impl: str = "gather"
    # Message-passing operator family:
    #   "bilinear"  — MPLayer (reference layers.py:5-46; the shipped model)
    #   "attention" — AMPLayer softmax attention over the K neighbor slots
    #                 (reference layers.py:48-100; present but unused there,
    #                 and with a latent bug C7 — implemented cleanly here)
    mp_type: str = "bilinear"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        d = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration.

    Mirrors the reference CLI options and callbacks (reference:
    main.py:36-68): Adam, ReduceLROnPlateau(factor=0.99, patience=4,
    min_lr=1e-4), per-epoch checkpointing, 10% validation split.
    """

    epochs: int = 3
    validation: float = 0.1
    loss_balance: float = 1.0   # s in NameLoss: L2*s + (1-s)*(1-r)
    checkpoint_path: str = "/tmp/checkpoint"
    # ReduceLROnPlateau equivalents (reference: main.py:54-55)
    lr_reduce_factor: float = 0.99
    lr_patience: int = 4
    min_lr: float = 1e-4
    # Learning-rate schedule:
    #   "plateau" — ReduceLROnPlateau, reference parity (main.py:54-55)
    #   "cosine"  — linear warmup over ``warmup_epochs`` then cosine decay
    #               from ``learning_rate`` to ``cosine_final_lr``. The
    #               TPU-native default recipe: a decayed endpoint removes
    #               the constant-LR noise floor the reference trains at.
    lr_schedule: str = "plateau"
    warmup_epochs: int = 0
    cosine_final_lr: float = 1e-6
    # Exponential moving average of params (0 = off). When enabled the
    # EMA weights are used for validation and final export; raw weights
    # keep training. Classic variance-reduction at evaluation time.
    ema_decay: float = 0.0
    # Restore the best-validation-loss weights at the end of fit().
    restore_best: bool = False
    # Padded fragment size for static-shape batching (new: the reference
    # trains shape-polymorphically on one fragment at a time, main.py:79-80;
    # we pad to fixed N for XLA).
    pad_to: int = 256
    batch_size: int = 8
    shuffle_buffer: int = 500
    seed: int = 0
    # Which message-passing implementation the TRAINING/EVAL steps run:
    #   "auto"   — the banded fast path on TPU when eligible, else gather
    #   "banded" — force the banded custom-VJP Pallas path
    #              (models/infer.apply_banded_fragments: ~2x faster
    #              steps than the gather math, grad parity to roundoff;
    #              interpreter-mode kernels off-TPU)
    #   "gather" — force the XLA gather+einsum path (gnn.apply_batched,
    #              reference-equivalent lowering)
    # Eligibility for banded: bilinear MP family, pad_to and
    # atom_feature_size multiples of 128, no tensor parallelism.
    mp_path: str = "auto"
    # Mild L2 decay on selected element COLUMNS of the out-head kernel
    # (peaks head, [F, n_elements]): pulls those channels toward the
    # frozen per-element mean (peak_avg), damping the extrapolation
    # bias on untrained out-of-vocabulary atoms of that element (the
    # P-X mitigation experiment, ACCURACY.md). 0 = off (default: the
    # reference has no such regularizer).
    head_decay: float = 0.0
    head_decay_elements: str = "N"
    # Run each epoch as ONE jitted lax.scan over the stacked batches
    # (single device dispatch + single loss readback per epoch) instead
    # of per-batch dispatch. Large wall-clock win when dispatch latency
    # is nontrivial (remote TPU); requires the epoch's batches to fit in
    # HBM alongside the model (fragments are tiny, so they do).
    compiled_epochs: bool = True

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        d = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})
