"""Shared deterministic fixture for the multi-host test: a 4-fragment
padded batch generated from seeded numpy (identical in every process and
in the single-process reference)."""
import numpy as np

from nmrgnn_tpu import ModelConfig
from nmrgnn_tpu.graph import Graph, inv_degree_from_nlist

CFG = ModelConfig(
    atom_feature_size=32,
    edge_hidden_size=16,
    mp_layers=2,
    fc_layers=3,
    edge_fc_layers=3,
    dropout=False,
    noise=0.0,
)


def make_batch(b=4, n=48, k=4, v=10, seed=0):
    rng = np.random.default_rng(seed)
    atoms = np.zeros((b, n, v), np.float32)
    for i in range(b):
        atoms[i, np.arange(n), rng.integers(0, v, n)] = 1.0
    nlist = rng.integers(0, n, (b, n, k)).astype(np.int32)
    edges = rng.uniform(0.01, 0.2, (b, n, k)).astype(np.float32)
    inv = np.stack([np.asarray(inv_degree_from_nlist(nl)) for nl in nlist])
    y = np.stack(
        [rng.normal(size=(b, n)).astype(np.float32) * 3 + 5,
         rng.integers(0, 6, (b, n)).astype(np.float32),
         np.ones((b, n), np.float32)],
        axis=-1,
    )
    w = (rng.uniform(size=(b, n)) > 0.2).astype(np.float32)
    g = Graph(atoms, nlist, edges, inv.astype(np.float32))
    return g, y, w
