from .activations import get_activation
from .message_passing import amp_layer, mp_aggregate, mp_layer
from .rbf import rbf_centers, rbf_expand

__all__ = [
    "get_activation",
    "amp_layer",
    "mp_aggregate",
    "mp_layer",
    "rbf_centers",
    "rbf_expand",
]
