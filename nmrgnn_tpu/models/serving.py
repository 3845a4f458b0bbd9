"""Production serving wrapper: compile-once, per-frame structure reuse.

Combines the serving-side optimizations:
  * RCM atom reordering (data/reorder.py) — fewer active blocks
  * per-frame block-sparse pattern with shape-stable pair rounding, so
    trajectory frames reuse one compiled kernel set
  * block-sparse Pallas MP on TPU, XLA block path on CPU

The reference's serving story is a Keras SavedModel called frame-by-frame
with host-built graphs and no cross-frame reuse (reference:
main.py:236-248).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..config import ModelConfig
from ..data.reorder import permute_graph, rcm_order
from ..graph import Graph
from ..ops.blocksparse import block_structure
from .infer import apply_blocksparse


class ServingModel:
    def __init__(
        self,
        params,
        config: ModelConfig,
        reorder: bool = True,
        block_size: int = 128,
        pair_rounding: int = 32,
        group: int = 4,
        use_pallas: Optional[bool] = None,
    ):
        self.params = params
        self.config = config
        self.reorder = reorder
        self.block_size = block_size
        self.pair_rounding = pair_rounding
        self.group = group
        self.use_pallas = (
            use_pallas
            if use_pallas is not None
            else jax.default_backend() not in ("cpu",)
        )
        self._order: Optional[np.ndarray] = None
        self._inverse: Optional[np.ndarray] = None

    def predict(self, graph: Graph) -> np.ndarray:
        """peaks f32[N] for a (numpy-backed) graph. The first call fixes
        the atom ordering; later calls (trajectory frames) reuse it."""
        g = Graph(*[np.asarray(a) for a in graph])
        if self.reorder:
            if self._order is None or self._order.shape[0] != g.atoms.shape[0]:
                self._order = rcm_order(g.nlist, g.edges)
            g, self._inverse = permute_graph(g, self._order)
        struct = block_structure(
            g.nlist, g.edges, self.block_size,
            pair_rounding=self.pair_rounding,
            group=self.group if self.use_pallas else 1,
        )
        import jax.numpy as jnp

        gj = Graph(*[jnp.asarray(a) for a in g])
        peaks = np.asarray(
            apply_blocksparse(
                self.params, self.config, gj, struct,
                use_pallas=self.use_pallas,
                group=self.group if self.use_pallas else 1,
            )
        )
        if self.reorder:
            peaks = peaks[self._inverse]
        return peaks

    def predict_trajectory(self, struct, stride: int = 1, neighbor_number: int = 16):
        """Iterate frames of a parsed Structure, yielding (frame_index,
        peaks f32[N]). Reuses the first frame's atom ordering and the
        compiled kernels across frames."""
        from ..data.parse import structure2graph

        for i in range(0, struct.n_frames, stride):
            g = structure2graph(struct, neighbor_number, frame=i)
            yield i, self.predict(g)
