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
from .config import ModelConfig, TrainConfig
from .graph import Graph, inv_degree_from_nlist, pad_graph, ring_graph
from .models.gnn import apply, apply_batched, count_params, init_params
from .version import __version__

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "Graph",
    "inv_degree_from_nlist",
    "pad_graph",
    "ring_graph",
    "apply",
    "apply_batched",
    "count_params",
    "init_params",
    "__version__",
]
