from .activations import get_activation
from .blocksparse import (
    BlockStructure,
    block_structure,
    build_block_adjacency,
    build_block_adjacency_pallas,
    mp_blocksparse,
    mp_blocksparse_xla,
)
from .message_passing import amp_layer, mp_aggregate, mp_layer
from .rbf import rbf_centers, rbf_expand

__all__ = [
    "get_activation",
    "BlockStructure",
    "block_structure",
    "build_block_adjacency",
    "build_block_adjacency_pallas",
    "mp_blocksparse",
    "mp_blocksparse_xla",
    "amp_layer",
    "mp_aggregate",
    "mp_layer",
    "rbf_centers",
    "rbf_expand",
]
