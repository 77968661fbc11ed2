"""Compact, broadcastable doc-id membership bitmap (tombstone masks).

Doc ids in this engine are DENSE (prefix-sum assignment,
operators/docids.py), so a packed bitset over [base, base + span) costs
span/8 bytes — ~125 MB per 10^9 ids — and ships ONCE per executor via
``SparkContext.broadcast`` instead of riding every task's pickled UDF
closure (the round-2 scale note on operators/wand.py). Beyond ~10^10 ids
per mask, shard the tombstones by doc range and co-partition them with
the doc-sharded segments (each shard only ever probes its own range), or
swap in a roaring bitmap; the membership API here (`in`, ``mask``) is
the contract the WAND kernel depends on.

The reference engine has no delete path (its index files are
write-once; SearchEngine Indexer/Program.cs builds, Engine serves) —
this supports the Lucene-style tombstone mask deletes.py adds on top.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np

# refuse dense allocation past 1 GiB of bits: ids this sparse are not the
# engine's dense doc-id space and need the range-sharded treatment above
_MAX_SPAN_BITS = 1 << 33


class DocIdBitmap:
    """Packed uint64 bitset over the id range [base, base + span)."""

    __slots__ = ("base", "span", "words", "count")

    def __init__(self, ids: Iterable[int] = ()):
        arr = np.fromiter((int(i) for i in ids), dtype=np.int64)
        arr = np.unique(arr)
        self.count = int(arr.size)
        if self.count == 0:
            self.base, self.span = 0, 0
            self.words = np.zeros(0, dtype=np.uint64)
            return
        if arr[0] < 0:
            raise ValueError("doc ids must be non-negative")
        self.base = int(arr[0])
        self.span = int(arr[-1]) - self.base + 1
        if self.span > _MAX_SPAN_BITS:
            raise ValueError(
                f"id span {self.span} too sparse for a dense bitmap; "
                "shard tombstones by doc range (see module docstring)"
            )
        off = (arr - self.base).astype(np.uint64)
        self.words = np.zeros((self.span + 63) // 64, dtype=np.uint64)
        np.bitwise_or.at(
            self.words, off >> np.uint64(6),
            np.uint64(1) << (off & np.uint64(63)),
        )

    @classmethod
    def from_dataframe(cls, df, col: str = "doc_id") -> "DocIdBitmap":
        """Build from a DataFrame of deleted ids. The single id column
        streams through the driver once (toLocalIterator — never a
        full-row collect); the resulting bitmap is what gets broadcast."""
        return cls(
            int(r[0]) for r in df.select(col).toLocalIterator()
        )

    def __contains__(self, doc_id: int) -> bool:
        off = int(doc_id) - self.base
        if off < 0 or off >= self.span:
            return False
        return bool((int(self.words[off >> 6]) >> (off & 63)) & 1)

    def __len__(self) -> int:
        return self.count

    def __bool__(self) -> bool:
        return self.count > 0

    def mask(self, doc_ids: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array, True where doc_id is set."""
        if self.count == 0:
            return np.zeros(len(doc_ids), dtype=bool)
        off = doc_ids.astype(np.int64) - self.base
        in_range = (off >= 0) & (off < self.span)
        out = np.zeros(len(doc_ids), dtype=bool)
        o = off[in_range].astype(np.uint64)
        out[in_range] = (
            (self.words[o >> np.uint64(6)] >> (o & np.uint64(63)))
            & np.uint64(1)
        ).astype(bool)
        return out

    def nbytes(self) -> int:
        return int(self.words.nbytes)
