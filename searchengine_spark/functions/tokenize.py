"""Tokenization — exact reference semantics, vectorized.

Reference semantics (SearchEngine Indexer/Program.cs:94-121 and :266-298):
scan characters; Unicode letters accumulate into the current token
(lowercased); ANY non-letter (digit, punctuation, whitespace) flushes the
token; the token is kept iff it is all-ASCII AND 1 <= len <= 20. So:

    "don't"                  -> ["don", "t"]
    "café"                   -> []            (non-ASCII letter kills token)
    "abc123def"              -> ["abc", "def"]
    "Pneumonoultramicroscopicsilico..." (>20) -> []

Three equivalent implementations are provided and tested against each other:

1. ``tokenize_py``    — pure Python (single-node oracle).
2. ``tokenize_udf``   — Arrow-batched pandas UDF (the engine's hot path).
3. ``TOKENIZE_SQL_*`` — SQL fragments (Spark SQL + DuckDB) for oracle checks.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TOKEN_LEN = 20

# Maximal runs of Unicode letters ([^\W\d_] == \p{L} in Python re).
_LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python tokenizer, reference semantics. Oracle-grade."""
    if not text:
        return []
    return [
        run.lower()
        for run in _LETTER_RUN.findall(text)
        if run.isascii() and len(run) <= MAX_TOKEN_LEN
    ]


def term_counts_py(text: str | None) -> Counter:
    """Per-doc term-frequency map (reference forward-index semantics)."""
    return Counter(tokenize_py(text))


# ---------------------------------------------------------------------------
# Arrow / pandas UDFs (engine hot path — batch-level Arrow transfer)
# ---------------------------------------------------------------------------

_POSTING_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )
)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """text -> array<string> of admitted tokens (duplicates preserved)."""
    findall = _LETTER_RUN.findall
    out = []
    for t in texts:
        if not t:
            out.append([])
        else:
            out.append(
                [r.lower() for r in findall(t) if r.isascii() and len(r) <= MAX_TOKEN_LEN]
            )
    return pd.Series(out)


@F.pandas_udf(_POSTING_TYPE)
def term_counts_udf(texts: pd.Series) -> pd.Series:
    """text -> array<struct<term,tf>>: the per-doc tf vector in ONE Arrow
    round-trip (replaces the reference's per-doc BST aggregation,
    Indexer/Program.cs:264-313, without an explode shuffle)."""
    findall = _LETTER_RUN.findall
    out = []
    for t in texts:
        if not t:
            out.append([])
            continue
        c = Counter(
            r.lower() for r in findall(t) if r.isascii() and len(r) <= MAX_TOKEN_LEN
        )
        out.append(list(c.items()))
    return pd.Series(out)


_FIELD_POSTING_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("field", T.StringType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("fdl", T.IntegerType(), False),
        ]
    )
)


@F.pandas_udf(_FIELD_POSTING_TYPE)
def split_field_postings_udf(texts: pd.Series, title_len: pd.Series) -> pd.Series:
    """(text, title_len) -> array<struct<field,term,tf,fdl>>: per-field
    term frequencies for the title/body token-window split (title = first
    ``title_len`` admitted tokens, body = rest) in ONE Arrow round-trip.
    A Column-side slice formulation would re-inline the tokenize UDF once
    per reference (Catalyst CollapseProject duplicates Python UDFs), so
    the whole split lives in one pass — the same shape as
    ``term_counts_udf``."""
    findall = _LETTER_RUN.findall
    out = []
    for t, tl in zip(texts, title_len):
        if not t:
            out.append([])
            continue
        toks = [
            r.lower() for r in findall(t)
            if r.isascii() and len(r) <= MAX_TOKEN_LEN
        ]
        tl = int(tl)
        rows = []
        for fname, ftoks in (("title", toks[:tl]), ("body", toks[tl:])):
            if not ftoks:
                continue
            fdl = len(ftoks)
            rows.extend(
                (fname, term, tf, fdl) for term, tf in Counter(ftoks).items()
            )
        out.append(rows)
    return pd.Series(out)


# ---------------------------------------------------------------------------
# SQL-expressible equivalents (for DuckDB / Spark SQL oracle checks).
# Split on non-letter runs, keep 1..20-char pure a-zA-Z tokens, lowercase.
# Equivalent to the Python tokenizer because: a run of letters is all-ASCII
# iff it matches [A-Za-z]+, and lower() agrees with Python .lower() on ASCII.
# ---------------------------------------------------------------------------

def duckdb_tokens_sql(col: str = "text") -> str:
    """DuckDB expression: list of admitted tokens for ``col``."""
    return (
        f"list_transform(list_filter(regexp_split_to_array({col}, '[^\\p{{L}}]+'),"
        f" t -> regexp_full_match(t, '[A-Za-z]{{1,{MAX_TOKEN_LEN}}}')), t -> lower(t))"
    )


def spark_tokens_sql(col: str = "text") -> str:
    """Spark SQL expression equivalent (used for plan-level tests)."""
    return (
        f"transform(filter(split({col}, '[^\\\\p{{L}}]+'),"
        f" t -> t rlike '^[A-Za-z]{{1,{MAX_TOKEN_LEN}}}$'), t -> lower(t))"
    )
