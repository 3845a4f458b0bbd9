"""Graph data structure and padding utilities.

The canonical molecular-graph representation is the padded fixed-degree
neighbor-list tuple used by the reference model's serving signature
(reference: model.py:245-249, SavedModel serving_default):

    atoms      f32[N, V]   one-hot element identity (V = num_elements)
    nlist      i32[N, K]   neighbor indices (K = neighbor_number)
    edges      f32[N, K]   neighbor distances, in nm
    inv_degree f32[N]      1 / (number of real neighbors)

Padding conventions (kept bit-compatible with the reference; see
SURVEY.md Appendix C1/C2):
  * a neighbor slot with distance 0 is masked out of edge features
    (``edges > 0`` mask, reference model.py:251)
  * a neighbor slot with index 0 does not count toward the degree
    (``nlist > 0``, reference library.py:115-116)
  * isolated atoms get inv_degree == 0 (divide_no_nan semantics)

``Graph`` is a pytree, so it can be jit-ed through, vmapped over a
leading batch dim, donated, and sharded with jax.sharding.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Graph(NamedTuple):
    atoms: jnp.ndarray       # f32[..., N, V] one-hot
    nlist: jnp.ndarray       # i32[..., N, K]
    edges: jnp.ndarray       # f32[..., N, K]
    inv_degree: jnp.ndarray  # f32[..., N]

    @property
    def num_atoms(self) -> int:
        return self.atoms.shape[-2]

    @property
    def num_neighbors(self) -> int:
        return self.nlist.shape[-1]

    @property
    def num_elements(self) -> int:
        return self.atoms.shape[-1]


def inv_degree_from_nlist(nlist) -> jnp.ndarray:
    """1/degree with the reference's conventions.

    degree counts slots with ``nlist > 0`` (reference library.py:115-116);
    degree==0 yields 0 rather than inf (tf.math.divide_no_nan).
    """
    deg = jnp.sum((nlist > 0).astype(jnp.float32), axis=-1)
    return jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)


def pad_graph(g: Graph, pad_to: int) -> Graph:
    """Pad a single (unbatched) graph with inert atoms up to ``pad_to``.

    Padding atoms have all-zero one-hot rows, nlist==0, edges==0 and
    inv_degree==0, so they send/receive no messages and produce zero
    output through every layer (masking follows from the conventions
    above). Enables static shapes under jit.
    """
    n = g.atoms.shape[0]
    if n > pad_to:
        raise ValueError(f"graph has {n} atoms > pad_to={pad_to}")
    if n == pad_to:
        return g
    p = pad_to - n
    return Graph(
        atoms=jnp.pad(g.atoms, ((0, p), (0, 0))),
        nlist=jnp.pad(g.nlist, ((0, p), (0, 0))),
        edges=jnp.pad(g.edges, ((0, p), (0, 0))),
        inv_degree=jnp.pad(g.inv_degree, ((0, p),)),
    )


def pad_graph_np(atoms, nlist, edges, inv_degree, pad_to: int):
    """Numpy variant of :func:`pad_graph` for host-side pipelines."""
    n = atoms.shape[0]
    if n > pad_to:
        raise ValueError(f"graph has {n} atoms > pad_to={pad_to}")
    p = pad_to - n
    return (
        np.pad(atoms, ((0, p), (0, 0))),
        np.pad(nlist, ((0, p), (0, 0))),
        np.pad(edges, ((0, p), (0, 0))),
        np.pad(inv_degree, ((0, p),)),
    )


def atom_mask(g: Graph) -> jnp.ndarray:
    """f32[..., N] — 1 for real atoms (nonzero one-hot row), 0 for padding."""
    return (jnp.sum(g.atoms, axis=-1) > 0).astype(jnp.float32)


def bucket_size(
    n: int,
    buckets=(256, 512, 768, 1024, 1536, 2048, 2560, 3072, 4096, 6144, 8192,
             12288, 16384),
) -> int:
    """Smallest bucket >= n; limits the number of distinct jit traces for
    ragged real molecules (SURVEY.md §7 hard part (b)) while keeping
    padding waste under ~30%."""
    for b in buckets:
        if n <= b:
            return b
    # round up to next multiple of 1024 beyond the largest bucket
    return ((n + 1023) // 1024) * 1024


def ring_graph(
    n: int = 5,
    k: int = 2,
    num_elements: int = 16,
    edge_value: float = 1.0,
    elements: Optional[list] = None,
) -> Graph:
    """The canonical 5-node ring test fixture (reference
    tests/test_nmrgnn.py:18-34): node i neighbors {i-1, i+1} mod n,
    all edges == edge_value, inv_degree == 1/k."""
    if elements is None:
        elements = [(3 * i + 2) % num_elements for i in range(n)]
    atoms = np.zeros((n, num_elements), dtype=np.float32)
    atoms[np.arange(n), np.asarray(elements) % num_elements] = 1.0
    nlist = np.zeros((n, k), dtype=np.int32)
    for i in range(n):
        for slot, j in enumerate(range(-1, k * 2 - 1, 2)):
            nlist[i, slot] = (i + j) % n
    edges = np.full((n, k), edge_value, dtype=np.float32)
    inv_degree = np.full((n,), 1.0 / k, dtype=np.float32)
    return Graph(
        atoms=jnp.asarray(atoms),
        nlist=jnp.asarray(nlist),
        edges=jnp.asarray(edges),
        inv_degree=jnp.asarray(inv_degree),
    )
