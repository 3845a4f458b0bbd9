"""256-atom fragment generation from whole structures.

The reference's training data is pre-fragmented into ~256-atom subgraphs
by the nmrdata pipeline (reference README.md:126: results "evaluated on
whole proteins instead of 256 atom fragments"; the fragmenting itself
lives outside the reference tree). We implement it natively: spatial
ball fragments around seed atoms, with a core/halo weighting so each
atom's shift is supervised only where its full neighborhood is present.

Also provides a synthetic labeled-dataset generator (geometry-derived
shifts) for end-to-end training tests and benchmarks without the
original proprietary shift databases.
"""
from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from .dataset import Sample, write_fragment
from .embeddings import element_to_index, load_embeddings, load_standards
from .neighbors import neighbors_host
from .parse import ANGSTROM_TO_NM, inv_degree_np
from .pdb import Structure
from .tfrecord import TFRecordWriter
from ..graph import Graph


def fragment_structure(
    struct: Structure,
    frame: int = 0,
    fragment_size: int = 256,
    neighbor_number: int = 16,
    core_fraction: float = 0.5,
    stride: Optional[int] = None,
    embeddings: Optional[dict] = None,
) -> Iterator[dict]:
    """Yield fragment dicts {atom_idx, nlist, edges, orig_index, weight}.

    Seeds stride over the structure; each fragment is the
    ``fragment_size`` atoms nearest the seed. The closest
    ``core_fraction`` get weight 1 (fully supervised); the halo gets 0
    — its role is to complete the core atoms' neighborhoods.
    """
    if embeddings is None:
        embeddings = load_embeddings()
    coords = struct.coords[frame]
    n = coords.shape[0]
    size = min(fragment_size, n)
    if stride is None:
        stride = max(1, int(size * core_fraction) // 2)
    elem_idx = np.asarray([element_to_index(e) for e in struct.elements], np.int64)

    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    for seed in range(0, n, stride):
        d, idx = tree.query(coords[seed], k=size)
        idx = np.atleast_1d(idx)
        d = np.atleast_1d(d)
        sub_coords = coords[idx]
        nlist, dists = neighbors_host(sub_coords, neighbor_number)
        edges = (dists * ANGSTROM_TO_NM).astype(np.float32)
        n_core = max(1, int(len(idx) * core_fraction))
        weight = np.zeros(len(idx), np.float32)
        weight[:n_core] = 1.0  # tree.query returns ascending distance
        yield {
            "atom_idx": elem_idx[idx],
            "nlist": nlist,
            "edges": edges,
            "orig_index": idx,
            "weight": weight,
        }


def synthetic_shift(atom_idx: np.ndarray, edges: np.ndarray, standards=None) -> np.ndarray:
    """Deterministic geometry-derived pseudo-shifts: element mean + a
    smooth function of the local distance environment, scaled by the
    element's shift std. Learnable by the model, so end-to-end training
    tests can assert real loss reduction."""
    if standards is None:
        standards = load_standards()
    avg = np.asarray([standards[i][1] for i in range(len(standards))])
    std = np.asarray([standards[i][2] for i in range(len(standards))])
    mean_d = np.where(
        (edges > 0).sum(-1) > 0,
        edges.sum(-1) / np.maximum((edges > 0).sum(-1), 1),
        0.0,
    )
    z = np.sin(25.0 * mean_d) + 0.5 * np.cos(60.0 * edges[:, 0])
    return (avg[atom_idx] + std[atom_idx] * 0.5 * z).astype(np.float32)


def name_index_for(struct: Structure, embeddings: Optional[dict] = None) -> np.ndarray:
    """'<RES>-<ATOMNAME>' vocab lookup per atom; unknown names -> 0."""
    if embeddings is None:
        embeddings = load_embeddings()
    names = embeddings["name"]
    return np.asarray(
        [names.get(f"{rn}-{an}", 0) for rn, an in zip(struct.resnames, struct.names)],
        np.int64,
    )


def write_structure_records(
    path: str,
    struct: Structure,
    frames: Optional[range] = None,
    shifts: Optional[np.ndarray] = None,  # f32[T, N] real labels if known
    neighbor_number: int = 16,
    append: bool = False,
) -> int:
    """Write WHOLE-STRUCTURE labeled records (one per frame) — the input
    format for graph-partitioned (context-parallel) training, where the
    intact protein trains across chips with no fragmenting at all
    (parallel/halo.make_partitioned_train_step; the reference can only
    train on ~256-atom fragments, SURVEY.md App. B / README.md:126).

    Same TFRecord schema as the fragment records (data/dataset.py), just
    with N = the full structure — the readers are shared. Labels default
    to the synthetic geometry-derived shifts; pass ``shifts`` f32[T, N]
    (NaN = unlabeled atom) for real data. Returns the record count.
    """
    embeddings = load_embeddings()
    name_idx = name_index_for(struct, embeddings)
    elem_idx = np.asarray(
        [element_to_index(e) for e in struct.elements], np.int64
    )
    frames = frames if frames is not None else range(struct.n_frames)
    count = 0
    with TFRecordWriter(path, append=append) as w:
        for t in frames:
            nlist, dists = neighbors_host(struct.coords[t], neighbor_number)
            edges = (dists * ANGSTROM_TO_NM).astype(np.float32)
            if shifts is not None:
                shift = np.asarray(shifts[t], np.float32)
                labeled = np.isfinite(shift)
                shift = np.where(labeled, shift, 0.0).astype(np.float32)
            else:
                shift = synthetic_shift(elem_idx, edges)
                labeled = np.ones(len(elem_idx), bool)
            label_weight = ((name_idx > 0) & labeled).astype(np.float32)
            write_fragment(
                w, elem_idx, nlist, edges, shift, name_idx, label_weight,
                np.ones(len(elem_idx), np.float32),
            )
            count += 1
    return count


def write_structure_fragments(
    path: str,
    struct: Structure,
    frames: Optional[range] = None,
    shifts: Optional[np.ndarray] = None,  # f32[T, N] real labels if known
    fragment_size: int = 256,
    neighbor_number: int = 16,
) -> int:
    """Fragment a structure (optionally over trajectory frames) into a
    TFRecord file. Without real shift labels, synthetic geometry-derived
    shifts are written (weight flags still honor name-vocabulary hits).
    Returns the number of records written."""
    embeddings = load_embeddings()
    name_idx_full = name_index_for(struct, embeddings)
    frames = frames or range(struct.n_frames)
    count = 0
    with TFRecordWriter(path) as w:
        for t in frames:
            for frag in fragment_structure(
                struct, t, fragment_size, neighbor_number, embeddings=embeddings
            ):
                idx = frag["orig_index"]
                if shifts is not None:
                    shift = shifts[t][idx].astype(np.float32)
                else:
                    shift = synthetic_shift(frag["atom_idx"], frag["edges"])
                name_idx = name_idx_full[idx]
                label_weight = (name_idx > 0).astype(np.float32)
                write_fragment(
                    w,
                    frag["atom_idx"],
                    frag["nlist"],
                    frag["edges"],
                    shift,
                    name_idx,
                    label_weight,
                    frag["weight"],
                )
                count += 1
    return count
