"""Portable deterministic hashing shared by Spark, DuckDB oracles, and the
pure-Python test oracles.

h32(s) = int(md5(s)[:8 hex], 16) — a 32-bit hash computable identically as:
  Spark :  conv(substring(md5(s),1,8),16,10)::long
  DuckDB:  ('0x' || substring(md5(s),1,8))::BIGINT
  Python:  int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

MinHash permutations: h_i(x) = (a_i*x + b_i) mod P, P = 2^61-1, a_i,b_i
deterministic from seed. a_i < 2^28 so a_i*h32 < 2^60 — no int64 overflow
(safe in Spark SQL bigint arithmetic, DuckDB, and numpy int64 alike).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1
_A_MAX = 1 << 28


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def h32_col(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_duckdb(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}),1,8))::BIGINT)"


def minhash_params(n_perm: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficient lists (a odd, nonzero)."""
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, _A_MAX, size=n_perm) * 2 + 1).tolist()
    b = rng.integers(0, MERSENNE_P, size=n_perm).tolist()
    return [int(x) for x in a], [int(x) for x in b]


def minhash_perm_py(h: int, a: int, b: int) -> int:
    return (a * h + b) % MERSENNE_P


# ---------------------------------------------------------------------------
# CRC-32 (reference oracle-compat keying)
# ---------------------------------------------------------------------------

def crc32_reference_py(data: bytes) -> int:
    """Table-driven IEEE CRC-32 exactly as the reference computes doc/term
    keys (SearchEngine DataStructures/DataStructs/CRC32.cs:13,29-43:
    reflected polynomial 0xEDB88320, init 0xFFFFFFFF, final complement).
    Re-derived here from the public standard algorithm; used only to PROVE
    that Spark's built-in ``F.crc32`` is bit-identical, so oracle-compat
    mode can key on ``F.crc32(term)`` without any custom UDF."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0xEDB88320 * (crc & 1))
    return crc ^ 0xFFFFFFFF


def crc32_col(col: Column) -> Column:
    """Reference-compatible key column: CRC32 of the UTF-8 term/title."""
    return F.crc32(F.encode(col, "UTF-8"))
