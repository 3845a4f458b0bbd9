"""TF-free TFRecord + tf.train.Example IO.

The reference consumes nmrdata's TFRecord fragment datasets through
tf.data (reference: library.py:59, main.py:111). Our data layer reads and
writes the same container format with no TensorFlow dependency:

  * TFRecord framing: [len u64le][masked-crc32c(len) u32le][payload]
    [masked-crc32c(payload) u32le]
  * payload: tf.train.Example protobuf, encoded/decoded with a minimal
    hand-rolled wire-format codec (fields: Example.features=1,
    Features.feature=1 (map), Feature.{bytes_list=1,float_list=2,
    int64_list=3}, *List.value=1).

A C++ fast path (native/) can replace this module's hot loops; the
numpy-vectorized CRC and packed-float decode here are already fast
enough for training-input rates on host.

Fragment record schema (our canonical layout; SURVEY.md Appendix B item
``dataset()``):
  atoms        int64[N]    element vocab indices
  nlist        int64[N*K]  neighbor indices
  edges        float[N*K]  neighbor distances (nm)
  shift        float[N]    label ppm (y[:,0])
  name_idx     int64[N]    atom-name vocab index (y[:,1])
  label_weight float[N]    label mask flag (y[:,2])
  weight       float[N]    per-atom sample weight (w)
"""
from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Union

import numpy as np

# ---------------------------------------------------------------------------
# crc32c (Castagnoli), numpy table-driven, with the TFRecord mask.

_POLY = 0x82F63B78


def _make_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ _POLY, t >> 1).astype(np.uint32)
    return t


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    """Pure-Python byte-at-a-time table CRC32C — the portability fallback.
    Hot paths (TFRecordWriter bulk writes, checked scans) go through the
    native C++ runtime (native/src/crc32c.h) instead."""
    table = _TABLE
    crc_val = 0xFFFFFFFF
    for b in data:
        crc_val = (crc_val >> 8) ^ int(table[(crc_val ^ b) & 0xFF])
    return crc_val ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    from .. import native

    lib = native.get_lib()
    if lib is not None:
        import ctypes

        buf = np.frombuffer(data, np.uint8)
        if buf.size:
            return int(
                lib.nmrgnn_masked_crc(
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size
                )
            )
    c = crc32c(data)
    return ((((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# protobuf wire-format primitives

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: memoryview, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


FeatureValue = Union[np.ndarray, List[bytes]]


def encode_example(features: Dict[str, FeatureValue]) -> bytes:
    """Encode {name: int/float array or list-of-bytes} as tf.train.Example."""
    entries = []
    for key, val in sorted(features.items()):
        if isinstance(val, (list, tuple)) and (not val or isinstance(val[0], bytes)):
            lst = b"".join(_len_delim(1, v) for v in val)
            feat = _len_delim(1, lst)  # bytes_list
        else:
            arr = np.asarray(val)
            if arr.dtype.kind in "iu":
                packed = b"".join(_varint(int(x) & 0xFFFFFFFFFFFFFFFF) for x in arr.ravel())
                feat = _len_delim(3, _len_delim(1, packed))  # int64_list packed
            elif arr.dtype.kind == "f":
                packed = arr.astype("<f4").tobytes()
                feat = _len_delim(2, _tag(1, 2) + _varint(len(packed)) + packed)
            else:
                raise TypeError(f"unsupported feature dtype {arr.dtype} for {key!r}")
        entry = _len_delim(1, key.encode()) + _len_delim(2, feat)
        entries.append(_len_delim(1, entry))
    features_msg = b"".join(entries)
    return _len_delim(1, features_msg)  # Example.features = 1


def _decode_list(buf: memoryview):
    """Decode a BytesList/FloatList/Int64List payload given its kind tag."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            payload = bytes(buf[pos : pos + ln])
            pos += ln
            yield_field = (field, payload)
        elif wire == 0:
            v, pos = _read_varint(buf, pos)
            yield_field = (field, v)
        elif wire == 5:
            v = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
            yield_field = (field, v)
        else:
            raise ValueError(f"unexpected wire type {wire}")
        yield yield_field


def decode_example(data: bytes) -> Dict[str, FeatureValue]:
    """Decode a tf.train.Example into {name: np.ndarray or [bytes]}."""
    out: Dict[str, FeatureValue] = {}
    buf = memoryview(data)
    for f_field, features_msg in _decode_list(buf):
        if f_field != 1:
            continue
        for e_field, entry in _decode_list(memoryview(features_msg)):
            if e_field != 1:
                continue
            key = None
            feat = None
            for k_field, v in _decode_list(memoryview(entry)):
                if k_field == 1:
                    key = v.decode()
                elif k_field == 2:
                    feat = v
            if key is None or feat is None:
                continue
            for t_field, lst in _decode_list(memoryview(feat)):
                if t_field == 1:  # bytes_list
                    out[key] = [v for _, v in _decode_list(memoryview(lst)) ]
                elif t_field == 2:  # float_list
                    vals: List[float] = []
                    for sub_field, v in _decode_list(memoryview(lst)):
                        if sub_field == 1 and isinstance(v, bytes):
                            vals.extend(np.frombuffer(v, "<f4").tolist())
                        elif sub_field == 1:
                            vals.append(v)
                    out[key] = np.asarray(vals, np.float32)
                elif t_field == 3:  # int64_list
                    ints: List[int] = []
                    for sub_field, v in _decode_list(memoryview(lst)):
                        if sub_field == 1 and isinstance(v, bytes):
                            mv = memoryview(v)
                            p = 0
                            while p < len(mv):
                                x, p = _read_varint(mv, p)
                                ints.append(x - (1 << 64) if x >= (1 << 63) else x)
                        elif sub_field == 1:
                            ints.append(v - (1 << 64) if v >= (1 << 63) else v)
                    out[key] = np.asarray(ints, np.int64)
    return out


# ---------------------------------------------------------------------------
# TFRecord container

class TFRecordWriter:
    """Buffered TFRecord writer. Records are framed and CRC'd in bulk by
    the native C++ runtime (native/src/tfrecord.cc) when available, with
    a pure-Python masked-CRC fallback.

    Buffering contract: records are durable only after flush()/close()
    (up to ``flush_every - 1`` records are held in memory). Prefer the
    context-manager form; __del__ flushes as a safety net, and writing
    after close() raises."""

    def __init__(self, path: str, append: bool = False, flush_every: int = 512):
        self._path = path
        self._flush_every = flush_every
        self._buf: list = []
        self._closed = False
        if not append:
            open(path, "wb").close()  # truncate up front; flushes append

    def write(self, payload: bytes) -> None:
        if self._closed:
            raise ValueError(f"write to closed TFRecordWriter({self._path!r})")
        self._buf.append(bytes(payload))
        if len(self._buf) >= self._flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        from .. import native

        if not native.tfrecord_write(self._path, self._buf, append=True):
            with open(self._path, "ab") as f:
                for payload in self._buf:
                    header = struct.pack("<Q", len(payload))
                    f.write(header)
                    f.write(struct.pack("<I", masked_crc(header)))
                    f.write(payload)
                    f.write(struct.pack("<I", masked_crc(payload)))
        self._buf.clear()

    def write_example(self, features: Dict[str, FeatureValue]) -> None:
        self.write(encode_example(features))

    def close(self):
        self.flush()
        self._closed = True

    def __del__(self):
        try:
            if not self._closed:
                self.flush()
        except Exception:
            pass  # interpreter teardown; nothing safe to do

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_tfrecord(path: str, check_crc: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file (native C++ scan
    when built; pure-Python fallback)."""
    from .. import native

    if native.available():
        scanned = native.tfrecord_scan(path, check_crc=check_crc)
        if scanned is not None:
            offsets, lengths = scanned
            with open(path, "rb") as f:
                data = f.read()
            for off, ln in zip(offsets, lengths):
                yield data[off : off + ln]
            return
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            if check_crc:
                if masked_crc(header) != hcrc or masked_crc(payload) != pcrc:
                    raise IOError(f"CRC mismatch in {path}")
            yield payload


def read_examples(path: str, check_crc: bool = False) -> Iterator[Dict[str, FeatureValue]]:
    for payload in read_tfrecord(path, check_crc):
        yield decode_example(payload)
