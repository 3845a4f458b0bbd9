"""Organic small-molecule pipeline: generation, combined protein+organic
training with live MB/DFT metrics, Mol-style evaluation."""
import numpy as np
import pytest

from nmrgnn_tpu.config import ModelConfig, TrainConfig
from nmrgnn_tpu.data.dataset import read_fragments, split_dataset
from nmrgnn_tpu.data.embeddings import ELEMENT_INDEX, load_embeddings
from nmrgnn_tpu.data.fragment import write_structure_fragments
from nmrgnn_tpu.data.organic import random_molecule, write_organic_fragments
from nmrgnn_tpu.data.pdb import read_structure
from nmrgnn_tpu.train.trainer import Trainer

PDB_108M = "/root/reference/tests/108M.pdb"

SMALL = ModelConfig(
    atom_feature_size=32, edge_hidden_size=16, mp_layers=2,
    fc_layers=2, edge_fc_layers=2, dropout=False, noise=0.0,
    learning_rate=1e-3,
)


class TestGenerator:
    def test_random_molecule_valences(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            coords, elem_idx = random_molecule(rng)
            assert coords.shape[0] == elem_idx.shape[0]
            assert coords.shape[0] >= 6
            # explicit hydrogens present
            assert (elem_idx == ELEMENT_INDEX["H"]).sum() > 0
            # no steric clashes below 0.85 A
            d = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
            np.fill_diagonal(d, 10)
            assert d.min() > 0.85

    def test_write_and_read(self, tmp_path):
        path = str(tmp_path / "org.tfrecord")
        n = write_organic_fragments(path, n_molecules=10, seed=1)
        assert n == 10
        samples = list(read_fragments(path))
        assert len(samples) == 10
        emb = load_embeddings()
        mb = {v for k, v in emb["name"].items() if k.startswith(("MB", "DFT"))}
        for s in samples:
            assert s.n < 256
            assert set(np.asarray(s.y[:, 1], np.int64).tolist()) <= mb

    def test_append(self, tmp_path):
        path = str(tmp_path / "org.tfrecord")
        write_organic_fragments(path, n_molecules=3, seed=1)
        write_organic_fragments(path, n_molecules=2, seed=2, append=True)
        assert len(list(read_fragments(path))) == 5


class TestCombinedTraining:
    def test_protein_plus_organic(self, tmp_path):
        """Combined training (BASELINE.json config 4): both protein and
        MB/DFT metrics live, loss decreases."""
        ppath = str(tmp_path / "prot.tfrecord")
        opath = str(tmp_path / "org.tfrecord")
        write_structure_fragments(
            ppath, read_structure(PDB_108M), frames=range(1), fragment_size=48
        )
        write_organic_fragments(opath, n_molecules=30, seed=0)
        train, val = split_dataset([ppath, opath], 0.15)
        # per-file split appends each file's validation share in order;
        # mix both families into the evaluated subset
        val_mixed = val[:4] + val[-4:]
        tr = Trainer(SMALL, TrainConfig(epochs=3, batch_size=4, pad_to=64))
        state = tr.fit(train[:24], val_mixed, verbose=False)
        assert state.history["loss"][-1] < state.history["loss"][0]
        ev = tr.evaluate(val_mixed, state.params)
        # organic classes present in validation metrics
        assert ev["avg_mb_count"] + ev["avg_dft_count"] > 0
        assert ev["avg_ha_count"] >= 0
