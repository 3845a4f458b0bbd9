"""Library API tests: bundled baseline round-trip, check_peaks behavior,
load_data parity shim (mirrors reference tests/test_nmrgnn.py:226-257)."""
import os

import numpy as np
import pytest

import nmrgnn_tpu

PDB_108M = "/root/reference/tests/108M.pdb"
HAS_BASELINE = os.path.exists(
    os.path.join(nmrgnn_tpu.load_baseline(), "params.msgpack")
)


@pytest.mark.skipif(not HAS_BASELINE, reason="bundled baseline not trained yet")
class TestBaseline:
    def test_load_model_default(self):
        params, cfg = nmrgnn_tpu.load_model()
        assert nmrgnn_tpu.count_params(params) == 1_070_477
        assert cfg.mp_layers == 4

    def test_predict_and_check_peaks_108M(self):
        params, cfg = nmrgnn_tpu.load_model()
        g = nmrgnn_tpu.universe2graph(PDB_108M)
        peaks = np.asarray(
            nmrgnn_tpu.apply(params, cfg, nmrgnn_tpu.Graph(*[np.asarray(a) for a in g]))
        )
        confident = nmrgnn_tpu.check_peaks(g.atoms, peaks)  # must not raise
        assert confident.mean() >= 0.75
        # chemically sane per-element ranges
        atoms = np.asarray(g.atoms)
        h = peaks[atoms[:, 4] == 1]
        c = peaks[atoms[:, 2] == 1]
        assert 0 < h.mean() < 12
        assert 100 < c.mean() < 150


class TestCheckPeaks:
    def test_raises_on_garbage(self):
        atoms = np.zeros((10, 10), np.float32)
        atoms[:, 4] = 1.0  # all H
        peaks = np.full(10, 1e6, np.float32)
        with pytest.raises(Warning):
            nmrgnn_tpu.check_peaks(atoms, peaks)

    def test_accepts_plausible(self):
        atoms = np.zeros((10, 10), np.float32)
        atoms[:, 4] = 1.0
        peaks = np.full(10, 5.6, np.float32)
        conf = nmrgnn_tpu.check_peaks(atoms, peaks)
        assert conf.all()

    def test_zero_std_elements_unconfident(self):
        atoms = np.zeros((4, 10), np.float32)
        atoms[:2, 0] = 1.0  # padding element: std 0
        atoms[2:, 4] = 1.0
        peaks = np.asarray([0.0, 0.0, 5.6, 5.6], np.float32)
        with pytest.raises(Warning):
            # only 50% confident < 75%
            nmrgnn_tpu.check_peaks(atoms, peaks)


def test_load_data_split(tmp_path):
    from nmrgnn_tpu.data.fragment import write_structure_fragments
    from nmrgnn_tpu.data.pdb import read_structure

    path = str(tmp_path / "f.tfrecord")
    write_structure_fragments(path, read_structure(PDB_108M), frames=range(1),
                              fragment_size=64)
    train, val = nmrgnn_tpu.load_data([path], 0.25)
    assert len(val) == int(0.25 * (len(train) + len(val)))


def test_setup_optimizations_noop():
    nmrgnn_tpu.setup_optimizations()  # must not raise
