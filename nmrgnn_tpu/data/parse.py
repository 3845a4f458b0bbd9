"""Structure -> graph conversion (the reference's universe2graph /
nmrdata.parse_universe path, reference: library.py:106-117; contract in
SURVEY.md Appendix B).

Conventions (validated against the baseline model's expectations):
  * atoms: one-hot over the canonical 10-element vocabulary
  * edges: k-NN distances in **nm** (PDB Angstrom / 10) so covalent bonds
    (0.10-0.15 nm) land mid-RBF-grid (rbf_low=0.005, rbf_high=0.20)
  * nlist: neighbor indices sorted by increasing distance
  * inv_degree: 1 / count(nlist > 0), 0 for isolated atoms
    (reference library.py:115-116 semantics, quirks C1/C2 preserved)
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..graph import Graph
from .embeddings import ELEMENTS, element_to_index, load_embeddings
from .neighbors import neighbors_host
from .pdb import Structure, read_structure

ANGSTROM_TO_NM = 0.1


def atoms_one_hot(elements, num_elements: int = len(ELEMENTS)) -> np.ndarray:
    idx = np.asarray([element_to_index(e) for e in elements], np.int32)
    out = np.zeros((len(idx), num_elements), np.float32)
    out[np.arange(len(idx)), idx] = 1.0
    return out


def inv_degree_np(nlist: np.ndarray) -> np.ndarray:
    deg = np.sum(nlist > 0, axis=-1).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
    return inv.astype(np.float32)


def parse_structure(
    struct: Structure,
    neighbor_number: int = 16,
    embeddings: Optional[dict] = None,
    frame: int = 0,
    warn: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(atoms one-hot, edges nm, nlist) for one frame — the
    nmrdata.parse_universe return order (edges before nlist, see
    SURVEY.md C12)."""
    if embeddings is None:
        embeddings = load_embeddings()
    num_elements = len(embeddings["atom"])
    atoms = atoms_one_hot(struct.elements, num_elements)
    coords = struct.coords[frame]
    nlist, dists = neighbors_host(coords, neighbor_number)
    edges = (dists * ANGSTROM_TO_NM).astype(np.float32)
    if warn:
        unknown = sum(1 for e in struct.elements if element_to_index(e) == 1)
        if unknown:
            import warnings

            warnings.warn(f"{unknown} atoms with unknown element mapped to 'Z'")
    return atoms, edges, nlist


def structure2graph(
    struct_or_path,
    neighbor_number: int = 16,
    frame: int = 0,
) -> Graph:
    """File path or Structure -> Graph pytree (numpy-backed).

    Equivalent of the reference's universe2graph (library.py:106-117);
    returns (atoms, nlist, edges, inv_degree) order."""
    struct = (
        struct_or_path
        if isinstance(struct_or_path, Structure)
        else read_structure(struct_or_path)
    )
    atoms, edges, nlist = parse_structure(struct, neighbor_number, frame=frame)
    return Graph(
        atoms=atoms,
        nlist=nlist.astype(np.int32),
        edges=edges,
        inv_degree=inv_degree_np(nlist),
    )
