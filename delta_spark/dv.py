"""Protocol-format deletion vectors: 64-bit RoaringBitmapArray codec,
Z85 descriptor encoding and the on-disk ``deletion_vector_<uuid>.bin``
blob layout.

Parity targets (behavior studied from the reference, re-implemented
from the public format specs):

- ``deletionvectors/RoaringBitmapArray.scala:595`` — *portable* 64-bit
  format: magic ``1681511377`` (int32 LE), then int64 LE bitmap count,
  then per 32-bit bitmap an int32 LE key followed by the standard
  roaring serialization (https://github.com/RoaringBitmap/RoaringFormatSpec).
- ``storage/dv/DeletionVectorStore.scala:89`` — blob file layout:
  1-byte format version (``1``), then per DV ``int32 BE size`` +
  ``data`` + ``int32 BE CRC32(data)``; the descriptor ``offset`` points
  at the size field and ``sizeInBytes`` is ``len(data)``.
- ``actions/DeletionVectorDescriptor.scala:245`` — storage markers
  ``u`` (z85 uuid → ``deletion_vector_<uuid>.bin`` under the table
  root), ``i`` (z85 inline data), ``p`` (absolute path).
- ``util/Codec.scala:57`` — Z85 alphabet / 4-byte-block Base85.

Everything here is driver- or executor-local byte twiddling over
numpy arrays; the row-level work (which rows are deleted) stays in
Spark — see ``commands/delete.py``.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

PORTABLE_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_MAX = 4096  # container cardinality above which a bitmap container is used

# ------------------------------------------------------------------ Z85 ----

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data``, zero-padding to a 4-byte boundary (the
    descriptor's ``sizeInBytes`` records the true length)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for (word,) in struct.iter_unpack(">I", data):
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[word % 85])
            word //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(encoded: str, output_length: int | None = None) -> bytes:
    if len(encoded) % 5:
        raise ValueError(f"Z85 input length {len(encoded)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(encoded), 5):
        word = 0
        for c in encoded[i:i + 5]:
            word = word * 85 + _Z85_DECODE[c]
        out += struct.pack(">I", word)
    return bytes(out[:output_length] if output_length is not None else out)


def encode_uuid(uid: _uuid.UUID, random_prefix: str = "") -> str:
    """``pathOrInlineDv`` for storageType 'u': optional prefix + z85 of
    the 16 big-endian UUID bytes (always 20 chars)."""
    return random_prefix + z85_encode(uid.bytes)


def decode_uuid(path_or_inline: str) -> tuple[str, _uuid.UUID]:
    """Split a 'u' ``pathOrInlineDv`` into (randomPrefix, uuid)."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    return prefix, _uuid.UUID(bytes=z85_decode(enc, 16))


def dv_file_name(uid: _uuid.UUID) -> str:
    return f"deletion_vector_{uid}.bin"


def absolute_dv_path(table_path: str, descriptor: dict) -> str:
    """Resolve the blob file a 'u' or 'p' descriptor points at.

    The canonical relative layout is `[<randomPrefix>/]deletion_vector_
    <uuid>.bin`, but the reference also supports a configured FILE-NAME
    prefix (DeletionVectorDescriptor.DELETION_VECTOR_FILE_NAME_PREFIX —
    its own test fixtures carry one), so when the canonical name is
    absent we fall back to the unique `*deletion_vector_<uuid>.bin`
    match in the same directory (the uuid makes it unambiguous)."""
    st = descriptor["storageType"]
    if st == "p":
        p = descriptor["pathOrInlineDv"]
        if p.startswith("file:") or "://" in p:
            # absolute DVs are URIs (DeletionVectorDescriptor
            # PATH_DV_MARKER): parse and percent-decode
            from urllib.parse import unquote, urlparse

            return unquote(urlparse(p).path)
        return p
    if st != "u":
        raise ValueError(f"not a file-backed DV descriptor: {st!r}")
    prefix, uid = decode_uuid(descriptor["pathOrInlineDv"])
    parts = [table_path] + ([prefix] if prefix else []) + [dv_file_name(uid)]
    p = os.path.join(*parts)
    if not os.path.exists(p):
        import glob as _glob

        hits = sorted(_glob.glob(os.path.join(
            _glob.escape(os.path.dirname(p)), f"*{dv_file_name(uid)}")))
        if len(hits) == 1:
            return hits[0]
    return p


# ------------------------------------------- 32-bit roaring containers ----

def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Standard-format serialization of one 32-bit roaring bitmap from
    a sorted unique uint32 array. Always emits the
    SERIAL_COOKIE_NO_RUNCONTAINER layout (cookie, count, descriptive
    headers, offset headers, array/bitmap containers)."""
    keys = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(values))
    n = len(uniq_keys)
    header = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    desc = bytearray()
    payloads = []
    for i, k in enumerate(uniq_keys):
        chunk = lows[bounds[i]:bounds[i + 1]]
        card = len(chunk)
        desc += struct.pack("<HH", int(k), card - 1)
        if card > _ARRAY_MAX:
            words = np.zeros(1024, dtype=np.uint64)
            np.bitwise_or.at(words, chunk >> 6,
                             np.uint64(1) << (chunk.astype(np.uint64) & np.uint64(63)))
            payloads.append(words.astype("<u8").tobytes())
        else:
            payloads.append(chunk.astype("<u2").tobytes())
    offsets = bytearray()
    pos = len(header) + len(desc) + 4 * n
    for p in payloads:
        offsets += struct.pack("<i", pos)
        pos += len(p)
    return bytes(header) + bytes(desc) + bytes(offsets) + b"".join(payloads)


def _deserialize_roaring32(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    """Parse one standard-format 32-bit roaring bitmap starting at
    ``pos``; returns (sorted uint32 values, next position). Handles
    array, bitmap and run containers."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nflag = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, nflag, pos), bitorder="little")[:n]
        pos += nflag
        has_offsets = n >= 4
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = np.zeros(n, dtype=np.uint8)
        has_offsets = True
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, c + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # containers are contiguous; offsets are redundant
    parts = []
    for i in range(n):
        hi = keys[i] << np.uint32(16)
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, "<u2", 2 * n_runs, pos).reshape(-1, 2)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(s, s + l + 1, dtype=np.uint32) for s, l in runs
            ]) if n_runs else np.empty(0, np.uint32)
        elif cards[i] > _ARRAY_MAX:
            words = np.frombuffer(buf, "<u8", 1024, pos)
            pos += 8192
            bits = np.unpackbits(words.view(np.uint8), bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
        else:
            vals = np.frombuffer(buf, "<u2", cards[i], pos).astype(np.uint32)
            pos += 2 * int(cards[i])
        parts.append(hi | vals)
    values = np.concatenate(parts) if parts else np.empty(0, np.uint32)
    return values, pos


# --------------------------------------- 64-bit RoaringBitmapArray ----

def serialize_rbm_array(row_indexes) -> bytes:
    """Serialize sorted-or-not int64 row indexes into the portable
    64-bit RoaringBitmapArray format *including* the leading magic."""
    vals = np.unique(np.asarray(row_indexes, dtype=np.uint64))
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    lows = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(vals))
    out = [struct.pack("<iq", PORTABLE_MAGIC, len(uniq))]
    for i, key in enumerate(uniq):
        out.append(struct.pack("<i", int(key)))
        out.append(_serialize_roaring32(lows[bounds[i]:bounds[i + 1]]))
    return b"".join(out)


def deserialize_rbm_array(data: bytes) -> np.ndarray:
    """Inverse of :func:`serialize_rbm_array` → sorted uint64 values.
    Accepts sparse keys and all three container kinds."""
    buf = memoryview(data)
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != PORTABLE_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    parts = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", buf, pos)
        vals32, pos = _deserialize_roaring32(buf, pos + 4)
        parts.append((np.uint64(key) << np.uint64(32)) | vals32.astype(np.uint64))
    return np.concatenate(parts) if parts else np.empty(0, np.uint64)


# ----------------------------------------------------- blob file I/O ----

def write_dv_file(path: str, blobs: list[bytes]) -> list[tuple[int, int, int]]:
    """Write DV ``data`` blobs into one ``.bin`` file; returns
    (offset, sizeInBytes, checksum) per blob, offset pointing at the
    int32 size field exactly like DeletionVectorStore.scala:217."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ranges = []
    with open(path, "wb") as f:
        f.write(b"\x01")
        offset = 1
        for data in blobs:
            crc = zlib.crc32(data) & 0xFFFFFFFF
            ranges.append((offset, len(data), crc))
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", crc))
            offset += 8 + len(data)
    return ranges


def read_dv_blob(path: str, offset: int, size_in_bytes: int) -> bytes:
    """Read + checksum-verify one DV blob from a ``.bin`` file."""
    with open(path, "rb") as f:
        f.seek(offset)
        (stored_size,) = struct.unpack(">i", f.read(4))
        if stored_size != size_in_bytes:
            raise IOError(
                f"DV size mismatch at {path}:{offset}: "
                f"file says {stored_size}, descriptor says {size_in_bytes}")
        data = f.read(size_in_bytes)
        (expected_crc,) = struct.unpack(">I", f.read(4))
    actual = zlib.crc32(data) & 0xFFFFFFFF
    if actual != expected_crc:
        raise IOError(f"DV checksum mismatch at {path}:{offset}")
    return data


def descriptor_row_indexes(table_path: str, descriptor: dict) -> np.ndarray:
    """Deleted row indexes (sorted uint64) for any protocol descriptor:
    'i' inline, 'u' uuid-relative, 'p' absolute path."""
    st = descriptor["storageType"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"],
                          int(descriptor["sizeInBytes"]))
        return deserialize_rbm_array(data)
    path = absolute_dv_path(table_path, descriptor)
    data = read_dv_blob(path, int(descriptor["offset"]),
                        int(descriptor["sizeInBytes"]))
    return deserialize_rbm_array(data)


def inline_descriptor(row_indexes) -> dict:
    """Build an 'i' (inline) descriptor from row indexes."""
    data = serialize_rbm_array(row_indexes)
    card = int(np.unique(np.asarray(row_indexes, dtype=np.uint64)).size)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(data),
            "sizeInBytes": len(data), "cardinality": card}
