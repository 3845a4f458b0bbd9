"""Atom reordering for locality.

Reverse Cuthill-McKee on the molecular graph reduces the bandwidth of the
neighbor structure, which directly shrinks the active block count of the
block-sparse message-passing operator (measured on 108M.pdb: 160 -> 110
active 128x128 blocks, 31% fewer kernel steps). New capability with no
reference equivalent — the reference processes atoms in PDB file order.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..graph import Graph


def rcm_order(nlist: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Permutation (new_position -> old_index) from reverse Cuthill-McKee
    over the symmetrized adjacency of real edges."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    nlist = np.asarray(nlist)
    edges = np.asarray(edges)
    n, k = nlist.shape
    rows = np.repeat(np.arange(n), k)
    cols = nlist.ravel()
    mask = edges.ravel() > 0
    a = csr_matrix(
        (np.ones(int(mask.sum()), np.float32), (rows[mask], cols[mask])),
        shape=(n, n),
    )
    a = a + a.T
    return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True), np.int64)


def permute_graph(
    graph: Graph, order: np.ndarray, pin_zero: bool = True
) -> Tuple[Graph, np.ndarray]:
    """Apply an atom permutation to a (numpy-backed) graph.

    Returns (permuted_graph, inverse) where ``peaks_original =
    peaks_permuted[inverse]``. Neighbor indices are remapped so graph
    semantics are identical up to row order.

    Note the index-0 padding quirk (SURVEY.md C1): degree counts
    ``nlist > 0``, so whichever atom lands at position 0 stops being
    countable as a neighbor. With ``pin_zero=True`` the atom originally
    at index 0 stays at position 0, so recomputing inv_degree from the
    permuted nlist reproduces the reference's exact numerics. Paths that
    carry ``inv_degree`` through the permutation (banded/block-sparse MP
    mask by edge distance, not index) can pass ``pin_zero=False``; the
    pin stretches one tile's neighbor window across the whole structure
    and ruins the band (measured on 108M.pdb: max window 785 -> 2230).
    """
    order = np.asarray(order)
    n = order.shape[0]
    if pin_zero:
        z = int(np.nonzero(order == 0)[0][0])
        if z != 0:
            order = np.concatenate([[0], np.delete(order, z)])
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    nlist = np.asarray(graph.nlist)
    g2 = Graph(
        atoms=np.asarray(graph.atoms)[order],
        nlist=inv[nlist][order].astype(nlist.dtype),
        edges=np.asarray(graph.edges)[order],
        inv_degree=np.asarray(graph.inv_degree)[order],
    )
    return g2, inv
