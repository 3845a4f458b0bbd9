"""TFRecord IO tests: round-trip through our hand-rolled codec, CRC
integrity, cross-validation against TensorFlow's own reader/writer
(TF is an oracle here only — the framework itself is TF-free), and the
fragment dataset pipeline."""
import os

import numpy as np
import pytest

from nmrgnn_tpu.data.dataset import (
    FragmentLoader,
    batch_samples,
    read_fragments,
    split_dataset,
    write_fragment,
)
from nmrgnn_tpu.data.fragment import write_structure_fragments
from nmrgnn_tpu.data.pdb import read_structure
from nmrgnn_tpu.data.tfrecord import (
    TFRecordWriter,
    decode_example,
    encode_example,
    masked_crc,
    read_examples,
    read_tfrecord,
)

PDB_108M = "/root/reference/tests/108M.pdb"


class TestCodec:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.tfrecord")
        feats = {
            "ints": np.asarray([1, 0, -3, 2**40], np.int64),
            "floats": np.asarray([0.5, -1.25, 3e8], np.float32),
            "raw": [b"hello", b"world"],
        }
        with TFRecordWriter(path) as w:
            w.write_example(feats)
            w.write_example({"ints": np.asarray([7], np.int64)})
        got = list(read_examples(path, check_crc=True))
        assert len(got) == 2
        np.testing.assert_array_equal(got[0]["ints"], feats["ints"])
        np.testing.assert_allclose(got[0]["floats"], feats["floats"])
        assert got[0]["raw"] == [b"hello", b"world"]
        np.testing.assert_array_equal(got[1]["ints"], [7])

    def test_crc_detects_corruption(self, tmp_path):
        path = str(tmp_path / "t.tfrecord")
        with TFRecordWriter(path) as w:
            w.write_example({"a": np.asarray([1.0], np.float32)})
        data = bytearray(open(path, "rb").read())
        data[-6] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(data))
        with pytest.raises(IOError):
            list(read_tfrecord(path, check_crc=True))

    def test_tf_reads_our_records(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        path = str(tmp_path / "ours.tfrecord")
        with TFRecordWriter(path) as w:
            w.write_example(
                {
                    "i": np.asarray([3, -1], np.int64),
                    "f": np.asarray([1.5, 2.5], np.float32),
                }
            )
        recs = list(tf.data.TFRecordDataset(path))
        assert len(recs) == 1
        ex = tf.train.Example()
        ex.ParseFromString(recs[0].numpy())
        assert list(ex.features.feature["i"].int64_list.value) == [3, -1]
        assert list(ex.features.feature["f"].float_list.value) == [1.5, 2.5]

    def test_we_read_tf_records(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        path = str(tmp_path / "tfs.tfrecord")
        ex = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "i": tf.train.Feature(int64_list=tf.train.Int64List(value=[5, 6])),
                    "f": tf.train.Feature(float_list=tf.train.FloatList(value=[0.25])),
                    "b": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"x"])),
                }
            )
        )
        with tf.io.TFRecordWriter(path) as w:
            w.write(ex.SerializeToString())
        got = list(read_examples(path, check_crc=True))
        assert len(got) == 1
        np.testing.assert_array_equal(got[0]["i"], [5, 6])
        np.testing.assert_allclose(got[0]["f"], [0.25])
        assert got[0]["b"] == [b"x"]


class TestFragmentPipeline:
    @pytest.fixture(scope="class")
    def frag_file(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("frags") / "108M.tfrecord")
        struct = read_structure(PDB_108M)
        n = write_structure_fragments(path, struct, frames=range(1))
        assert n > 5
        return path

    def test_read_fragments(self, frag_file):
        samples = list(read_fragments(frag_file))
        s = samples[0]
        assert s.graph.atoms.shape == (256, 10)
        assert s.graph.nlist.shape == (256, 16)
        assert s.y.shape == (256, 3)
        assert s.w.shape == (256,)
        # core/halo weighting
        assert 0 < s.w.sum() < 256
        # labels: named atoms have label_weight 1
        assert s.y[:, 2].sum() > 100

    def test_split_and_loader(self, frag_file):
        train, val = split_dataset([frag_file], 0.2)
        total = len(train) + len(val)
        assert len(val) == int(0.2 * total)
        loader = FragmentLoader(train, pad_to=256, batch_size=4, seed=1)
        batches = list(loader.batches())
        assert len(batches) == len(loader)
        g, y, w = batches[0]
        assert g.atoms.shape == (4, 256, 10)
        assert y.shape == (4, 256, 3)
        assert w.shape == (4, 256)

    def test_ragged_final_batch_zero_weight(self, frag_file):
        train, _ = split_dataset([frag_file], 0.0)
        k = (len(train) % 3) or 3
        loader = FragmentLoader(train, pad_to=256, batch_size=3, shuffle=False)
        last = list(loader.batches())[-1]
        g, y, w = last
        n_real = len(train) % 3 or 3
        if n_real < 3:
            assert np.all(w[n_real:] == 0)

    def test_shuffle_reproducible(self, frag_file):
        train, _ = split_dataset([frag_file], 0.0)
        l1 = FragmentLoader(train, batch_size=2, seed=7)
        l2 = FragmentLoader(train, batch_size=2, seed=7)
        b1 = next(iter(l1.batches()))
        b2 = next(iter(l2.batches()))
        np.testing.assert_array_equal(b1[1], b2[1])
