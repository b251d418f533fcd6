"""Protocol deletion-vector codec round-trips (RoaringBitmapArray
portable format, Z85, blob file layout) — pure numpy, no Spark."""

import os
import struct
import uuid

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from delta_spark import dv


# ------------------------------------------------------------------ Z85 ----

def test_z85_known_vector():
    # ZeroMQ RFC 32 reference vector
    assert dv.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])


def test_z85_padding_trimmed():
    data = b"\x01\x02\x03\x04\x05"
    enc = dv.z85_encode(data)
    assert len(enc) == 10  # padded to 8 bytes -> 2 blocks
    assert dv.z85_decode(enc, 5) == data


def test_uuid_roundtrip_20_chars():
    uid = uuid.uuid4()
    enc = dv.encode_uuid(uid)
    assert len(enc) == 20
    prefix, back = dv.decode_uuid(enc)
    assert prefix == "" and back == uid
    prefix, back = dv.decode_uuid(dv.encode_uuid(uid, "ab"))
    assert prefix == "ab" and back == uid


# ------------------------------------------------- roaring round-trips ----

CASES = [
    [],
    [0],
    [0, 1, 2, 3],
    [5, 70000, 70001],                       # two 16-bit containers
    list(range(5000)),                       # bitmap container (card > 4096)
    [2**32 - 1, 2**32, 2**32 + 7],           # crosses the 32-bit key boundary
    [0, 2**33 + 17, 2**34],                  # sparse high keys
    list(range(0, 200000, 3)),               # multiple mixed containers
]


@pytest.mark.parametrize("vals", CASES)
def test_rbm_array_roundtrip(vals):
    data = dv.serialize_rbm_array(vals)
    assert struct.unpack_from("<i", data)[0] == dv.PORTABLE_MAGIC
    out = dv.deserialize_rbm_array(data)
    assert out.tolist() == sorted(set(vals))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_rbm_array_roundtrip_property(vals):
    out = dv.deserialize_rbm_array(dv.serialize_rbm_array(vals))
    assert out.tolist() == sorted(set(vals))


def test_run_container_decode():
    # hand-build a run-container bitmap: cookie 12347, 1 container,
    # run flag set, key 0 card 10, runs [(3 len 4), (100 len 5)]
    body = struct.pack("<i", dv._SERIAL_COOKIE_RUN | (0 << 16))
    body += bytes([0x01])                      # run flag bitmap (1 container)
    body += struct.pack("<HH", 0, 10 - 1)      # key, cardinality-1
    body += struct.pack("<H", 2)               # number of runs
    body += struct.pack("<HHHH", 3, 3, 100, 4)  # (start, length) pairs
    vals, pos = dv._deserialize_roaring32(memoryview(body), 0)
    assert vals.tolist() == [3, 4, 5, 6, 100, 101, 102, 103, 104]
    assert pos == len(body)


# ------------------------------------------------------- blob file I/O ----

def test_dv_file_layout_and_readback(tmp_path):
    p = str(tmp_path / "deletion_vector_test.bin")
    b1 = dv.serialize_rbm_array([1, 2, 3])
    b2 = dv.serialize_rbm_array(range(10000))
    ranges = dv.write_dv_file(p, [b1, b2])
    raw = open(p, "rb").read()
    assert raw[0] == 1                         # format version byte
    (off1, size1, _), (off2, size2, _) = ranges
    assert off1 == 1 and size1 == len(b1)
    assert off2 == 1 + 4 + len(b1) + 4
    assert struct.unpack_from(">i", raw, off1)[0] == len(b1)  # big-endian size
    assert dv.read_dv_blob(p, off1, size1) == b1
    assert dv.deserialize_rbm_array(dv.read_dv_blob(p, off2, size2)).size == 10000


def test_dv_file_checksum_detects_corruption(tmp_path):
    p = str(tmp_path / "deletion_vector_x.bin")
    blob = dv.serialize_rbm_array([7, 8])
    (off, size, _), = dv.write_dv_file(p, [blob])
    raw = bytearray(open(p, "rb").read())
    raw[off + 6] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        dv.read_dv_blob(p, off, size)


def test_descriptor_row_indexes_inline_and_file(tmp_path):
    idx = [0, 5, 2**33]
    d = dv.inline_descriptor(idx)
    assert d["storageType"] == "i" and d["cardinality"] == 3
    assert dv.descriptor_row_indexes(str(tmp_path), d).tolist() == sorted(idx)

    uid = uuid.uuid4()
    blob = dv.serialize_rbm_array(idx)
    path = os.path.join(str(tmp_path), dv.dv_file_name(uid))
    (off, size, _), = dv.write_dv_file(path, [blob])
    ud = {"storageType": "u", "pathOrInlineDv": dv.encode_uuid(uid),
          "offset": off, "sizeInBytes": size, "cardinality": 3}
    assert dv.absolute_dv_path(str(tmp_path), ud) == path
    assert dv.descriptor_row_indexes(str(tmp_path), ud).tolist() == sorted(idx)
