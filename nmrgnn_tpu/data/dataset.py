"""Fragment dataset pipeline: TFRecord fragments -> padded, batched,
device-ready training samples.

Mirrors the reference's load_data contract (reference: library.py:50-89):
per-file validation split (first ``validation`` fraction of each file so
every source file is represented in validation), shuffled training
stream. Unlike the reference — which feeds one shape-polymorphic
fragment per step (quirk C11) — we pad fragments to a fixed size and
batch them, giving XLA static shapes and the MXU real work per step.

A sample is ``(Graph, y f32[N,3], w f32[N])`` with
``y = (shift, name_idx, weight_flag)`` (reference main.py:27-33).
"""
from __future__ import annotations

import dataclasses
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..graph import Graph
from .embeddings import load_embeddings
from .parse import inv_degree_np
from .tfrecord import TFRecordWriter, read_examples


@dataclasses.dataclass
class Sample:
    graph: Graph  # numpy-backed
    y: np.ndarray  # f32[N, 3]
    w: np.ndarray  # f32[N]

    @property
    def n(self) -> int:
        return self.y.shape[0]


def write_fragment(
    writer: TFRecordWriter,
    atom_idx: np.ndarray,     # i64[N] element vocab indices
    nlist: np.ndarray,        # i[N, K]
    edges: np.ndarray,        # f[N, K]
    shift: np.ndarray,        # f[N]
    name_idx: np.ndarray,     # i[N]
    label_weight: np.ndarray,  # f[N]
    weight: np.ndarray,       # f[N]
) -> None:
    n, k = nlist.shape
    writer.write_example(
        {
            "atoms": np.asarray(atom_idx, np.int64),
            "nlist": np.asarray(nlist, np.int64).ravel(),
            "edges": np.asarray(edges, np.float32).ravel(),
            "shift": np.asarray(shift, np.float32),
            "name_idx": np.asarray(name_idx, np.int64),
            "label_weight": np.asarray(label_weight, np.float32),
            "weight": np.asarray(weight, np.float32),
            "k": np.asarray([k], np.int64),
        }
    )


_EXPECTED_KEYS = ("atoms", "nlist", "edges", "shift", "name_idx",
                  "label_weight", "weight")


def example_to_sample(ex: dict, num_elements: int) -> Sample:
    missing = [k for k in _EXPECTED_KEYS if k not in ex]
    if missing:
        # Fail loudly with enough context to write an adapter: the
        # fragment schema here is this framework's own (data/fragment.py);
        # genuine nmrdata records (SURVEY.md Appendix B — exact schema
        # unpublished) will land here and must be mapped explicitly.
        raise ValueError(
            f"fragment record is missing fields {missing}; found keys "
            f"{sorted(ex)}. If this is an external (nmrdata) TFRecord, "
            "its schema differs from nmrgnn_tpu's native fragment schema "
            "— convert it with a field mapping (see data/fragment.py for "
            "the expected per-atom arrays) rather than reading it directly."
        )
    atom_idx = np.asarray(ex["atoms"], np.int64)
    n = atom_idx.shape[0]
    k = int(ex["k"][0]) if "k" in ex else ex["nlist"].shape[0] // n
    if atom_idx.size and (atom_idx.min() < 0 or atom_idx.max() >= num_elements):
        bad = atom_idx[(atom_idx < 0) | (atom_idx >= num_elements)]
        raise ValueError(
            f"fragment record has element indices outside the "
            f"{num_elements}-element vocabulary (e.g. {bad[:5].tolist()}); "
            "the record was written with a different vocabulary — convert "
            "it explicitly instead of aliasing indices"
        )
    atoms = np.zeros((n, num_elements), np.float32)
    atoms[np.arange(n), atom_idx] = 1.0
    nlist = np.asarray(ex["nlist"], np.int64).reshape(n, k).astype(np.int32)
    edges = np.asarray(ex["edges"], np.float32).reshape(n, k)
    y = np.stack(
        [
            np.asarray(ex["shift"], np.float32),
            np.asarray(ex["name_idx"], np.float32),
            np.asarray(ex["label_weight"], np.float32),
        ],
        axis=1,
    )
    w = np.asarray(ex["weight"], np.float32)
    g = Graph(atoms=atoms, nlist=nlist, edges=edges, inv_degree=inv_degree_np(nlist))
    return Sample(graph=g, y=y, w=w)


def read_fragments(path: str, num_elements: int = 10) -> Iterator[Sample]:
    for ex in read_examples(path):
        yield example_to_sample(ex, num_elements)


def pad_sample(s: Sample, pad_to: int) -> Sample:
    n = s.n
    if n > pad_to:
        raise ValueError(f"fragment with {n} atoms > pad_to={pad_to}")
    p = pad_to - n
    if p == 0:
        return s
    g = s.graph
    return Sample(
        graph=Graph(
            atoms=np.pad(g.atoms, ((0, p), (0, 0))),
            nlist=np.pad(g.nlist, ((0, p), (0, 0))),
            edges=np.pad(g.edges, ((0, p), (0, 0))),
            inv_degree=np.pad(g.inv_degree, ((0, p),)),
        ),
        y=np.pad(s.y, ((0, p), (0, 0))),
        w=np.pad(s.w, ((0, p),)),
    )


def batch_samples(samples: Sequence[Sample], pad_to: int) -> Tuple[Graph, np.ndarray, np.ndarray]:
    padded = [pad_sample(s, pad_to) for s in samples]
    graph = Graph(
        *[np.stack([getattr(s.graph, f) for s in padded]) for f in Graph._fields]
    )
    y = np.stack([s.y for s in padded])
    w = np.stack([s.w for s in padded])
    return graph, y, w


def split_dataset(
    paths: Sequence[str],
    validation: float,
    num_elements: int = 10,
) -> Tuple[List[Sample], List[Sample]]:
    """Per-file take/skip split (reference library.py:57-72): the first
    ``validation`` fraction of each file goes to validation."""
    train: List[Sample] = []
    val: List[Sample] = []
    for p in paths:
        samples = list(read_fragments(p, num_elements))
        vs = int(validation * len(samples))
        val.extend(samples[:vs])
        train.extend(samples[vs:])
    return train, val


class FragmentLoader:
    """Shuffled, batched, padded iterator over in-memory fragments with a
    background thread staging the next batch (host-side prefetch; the
    reference relies on tf.data AUTOTUNE, library.py:88-89)."""

    def __init__(
        self,
        samples: Sequence[Sample],
        pad_to: int = 256,
        batch_size: int = 8,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
    ):
        if not samples:
            raise ValueError("empty dataset")
        self.samples = list(samples)
        self.pad_to = pad_to
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.samples)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self):
        order = np.arange(len(self.samples))
        if self.shuffle:
            self._rng.shuffle(order)
        return order

    def batches(self) -> Iterator[Tuple[Graph, np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        bs = self.batch_size
        stop = len(order) - (len(order) % bs) if self.drop_remainder else len(order)
        chunks = [order[i : i + bs] for i in range(0, stop, bs)]
        if not chunks:
            return
        result: List = [None]
        done = threading.Event()

        def stage(idx_chunk):
            group = [self.samples[i] for i in idx_chunk]
            # pad ragged final batch by repeating the last sample so
            # shapes stay static; repeated copies get zero weight
            n_real = len(group)
            while len(group) < bs:
                group.append(group[-1])
            g, y, w = batch_samples(group, self.pad_to)
            if n_real < bs:
                w = w.copy()
                w[n_real:] = 0.0
                y = y.copy()
                y[n_real:, :, 2] = 0.0
            return g, y, w

        # simple one-step lookahead prefetch
        nxt = stage(chunks[0])
        for i in range(len(chunks)):
            cur = nxt
            holder = {}

            def work(j=i + 1):
                if j < len(chunks):
                    holder["v"] = stage(chunks[j])

            t = threading.Thread(target=work)
            t.start()
            yield cur
            t.join()
            nxt = holder.get("v")
