"""Posting-list compression codecs — numpy-vectorized varint (LEB128) and
delta (gap) encoding of sorted docID arrays.

The reference stores raw 8-byte [docCRC:u32][tf:u32] postings
(SearchEngine File Structures/reverse_index.bin, Indexer/Program.cs:583-761).
We instead store delta-encoded docID gaps + tfs, each varint-compressed
(~2-4 bytes/posting for dense corpora), per the segment format in SURVEY.md
§2.8. All codecs are pure numpy so they run vectorized inside Arrow UDFs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varint_encode",
    "varint_decode",
    "delta_encode",
    "delta_decode",
    "encode_postings",
    "decode_postings",
]


def varint_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array (vectorized); also return the per-value byte
    START offsets (length n+1), so callers can slice the blob into
    sub-ranges of values without re-encoding (segment batch encoder)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.zeros(1, np.int64)
    # bytes needed per value
    nbytes = np.ones(n, np.int64)
    t = v >> np.uint64(7)
    while t.any():
        nbytes += (t != 0).astype(np.int64)
        t >>= np.uint64(7)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], np.uint8)
    pos = offsets[:-1].copy()
    t = v.copy()
    live = np.arange(n)
    while live.size:
        byte = (t[live] & np.uint64(0x7F)).astype(np.uint8)
        t[live] >>= np.uint64(7)
        more = t[live] != 0
        out[pos[live]] = byte | (more.astype(np.uint8) << np.uint8(7))
        pos[live] += 1
        live = live[more]
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    return varint_encode_with_offsets(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(ends.size, np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for k in range(maxlen):
        idx = starts + k
        valid = idx <= ends
        vals = (b[idx[valid]] & np.uint8(0x7F)).astype(np.uint64)
        out[valid] |= vals << np.uint64(7 * k)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> gaps (first element kept as-is)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode."""
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted unique doc_ids, aligned tfs) -> (gap varint bytes, tf varint bytes)."""
    return varint_encode(delta_encode(doc_ids)), varint_encode(tfs)


def decode_postings(doc_gaps: bytes, tfs: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_postings -> (doc_ids uint64, tfs uint64)."""
    return delta_decode(varint_decode(doc_gaps)), varint_decode(tfs)
