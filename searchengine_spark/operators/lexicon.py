"""Lexicon-side query assistance: prefix autocomplete and
did-you-mean spelling suggestion.

The reference engine serves raw queries only (Engine.cs Search splits
and looks terms up; a typo'd term simply contributes nothing,
Engine.cs:127-137). A usable engine suggests: both operators run over
the TERM DICTIONARY (one row per distinct term — at 10^12 turns still
only 10^7-10^8 rows, the smallest table in the system), never over
postings or documents.

Scale shape:
- ``suggest_prefix``: a `startswith` filter compiles to
  `StartsWith`/`LIKE 'p%'` — at cluster scale the lexicon is stored
  sorted by term, so the filter prunes row groups via parquet min/max
  (a prefix is a contiguous term range); df-ranked top-k via
  TakeOrderedAndProject.
- ``did_you_mean``: `levenshtein(term, q) <= max_dist` over the
  lexicon with a length pre-filter (|len-len(q)| <= max_dist — a
  cheap pushed-down predicate that skips most of the dictionary before
  the O(len^2) edit-distance runs); ranked by (distance asc, df desc).
  Both stay entirely in whole-stage codegen (built-in levenshtein).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(term_stats: DataFrame, prefix: str,
                   k: int = 10) -> DataFrame:
    """Top-``k`` lexicon terms starting with ``prefix``, by df desc
    (term asc tie-break) — autocomplete."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def did_you_mean(term_stats: DataFrame, query_term: str, k: int = 5,
                 max_dist: int = 2) -> DataFrame:
    """Closest lexicon terms within ``max_dist`` edits of
    ``query_term``, ranked (distance asc, df desc, term asc). The
    query term itself is excluded — these are corrections."""
    q = query_term.lower()
    pre = F.abs(F.length("term") - F.lit(len(q))) <= max_dist
    d = F.levenshtein("term", F.lit(q))
    return (
        term_stats.filter(pre)
        .withColumn("dist", d.cast("long"))
        .filter((F.col("dist") <= max_dist) & (F.col("term") != q))
        .select("term", "dist", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )
