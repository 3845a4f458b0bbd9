"""nmrgnn_tpu — a TPU-native (JAX/XLA/Pallas) framework for predicting NMR
chemical shifts of protein structures and organic molecules with
message-passing GNNs over padded fixed-degree neighbor-list graphs.

Built from scratch with the capabilities of ur-whitelab/nmrgnn
(reference mounted at /root/reference), redesigned TPU-first:
  * functional JAX model over pytree params (jit/vmap/shard_map-friendly)
  * Pallas block-sparse adjacency kernels for the message-passing hot loop
  * jax.sharding mesh parallelism (data parallel + atom-partitioned graphs)
  * native data layer (embeddings, peak standards, PDB parsing, neighbor
    search, TFRecord IO) replacing the external nmrdata package
"""
import os as _os

if _os.environ.get("NMRGNN_TPU_FORCE_CPU"):
    # some environments pre-register an accelerator PJRT plugin via
    # sitecustomize and pin JAX_PLATFORMS; honor an explicit CPU override
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from .config import ModelConfig, TrainConfig
from .graph import Graph, inv_degree_from_nlist, pad_graph, ring_graph
from .library import (
    build_GNNModel,
    check_peaks,
    load_baseline,
    load_data,
    load_model,
    save_model,
    setup_optimizations,
    universe2graph,
)
from .models.gnn import apply, apply_batched, count_params, init_params
from .models.serving import ServingModel
from .train.losses import name_loss
from .train.metrics import name_corr, name_count, name_rmsd, type_mask
from .version import __version__

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "Graph",
    "inv_degree_from_nlist",
    "pad_graph",
    "ring_graph",
    "build_GNNModel",
    "check_peaks",
    "load_baseline",
    "load_data",
    "load_model",
    "save_model",
    "setup_optimizations",
    "universe2graph",
    "apply",
    "apply_batched",
    "count_params",
    "init_params",
    "ServingModel",
    "name_loss",
    "name_corr",
    "name_count",
    "name_rmsd",
    "type_mask",
    "__version__",
]
