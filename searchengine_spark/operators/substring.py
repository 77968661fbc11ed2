"""Substring search over raw text via a character-trigram index — the
pg_trgm / Lucene wildcard-field shape. The reference engine has no
substring capability (its Engine.cs tokenizes queries like documents); a
transcripts corpus wants it for grepping tool names, error strings, and
identifiers that the letter-run tokenizer splits or drops.

Plan shape (the part that matters at 100 TB):
- index: ``doc_trigrams`` emits the DISTINCT lowercased character
  trigrams of each doc — in-row JVM ``transform`` over a codepoint
  sequence, one explode, one distinct. Persisted sorted by gram it is a
  partition-prunable posting-list table exactly like the term index.
- query: the needle's trigrams (tiny, a plan literal) select only those
  grams' posting rows (pushed-down IN); a doc is a CANDIDATE iff it
  contains ALL of them (count-distinct == n_grams — the pg_trgm AND
  semantics). Candidate cardinality is bounded by the rarest trigram's
  df, never the corpus.
- verify: only candidate docs are re-read; occurrence counting is one
  JVM expression (length delta / needle length — non-overlapping
  occurrences, the REPLACE contract in Spark and DuckDB alike).

Needles shorter than 3 characters cannot use the gram index and fall
back to a documented full-scan verify (same output contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NGRAM = 3


def _grams_expr(col: str, n: int = NGRAM) -> str:
    """In-row distinct character n-grams of lower(col) — pure JVM."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({col}) - {n - 1}, 0)),"
        f" i -> substring({col}, i, {n})))"
    )


def doc_trigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(gram, doc_id) distinct trigram postings over lowercased text."""
    return (
        docs.select("doc_id", F.lower(F.col(text_col)).alias("_lt"))
        .select("doc_id", F.explode(F.expr(_grams_expr("_lt"))).alias("gram"))
    )


def build_trigram_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Persistable trigram posting table, clustered by gram so a needle's
    gram filter prunes row groups (write with
    ``.repartitionByRange('gram').sortWithinPartitions('gram')``)."""
    return doc_trigrams(docs, text_col)


def needle_grams(needle: str, n: int = NGRAM) -> list[str]:
    s = needle.lower()
    return sorted({s[i : i + n] for i in range(len(s) - n + 1)})


def _occurrences(text_col, needle: str):
    """Non-overlapping occurrence count of ``needle`` in lower(text) —
    (len - len(replace(...))) / len(needle), exact integer arithmetic."""
    lt = F.lower(text_col)
    delta = F.length(lt) - F.length(F.replace(lt, F.lit(needle.lower())))
    return (delta / F.lit(len(needle))).cast("long")


def substring_search(
    docs: DataFrame,
    needle: str,
    k: int = 10,
    grams: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by occurrence count of ``needle`` (case-insensitive),
    ties broken by doc_id. ``grams``: a prebuilt/persisted trigram index
    (``build_trigram_index`` output); built on the fly when absent."""
    ng = needle_grams(needle)
    if ng:
        if grams is None:
            grams = doc_trigrams(docs, text_col)
        cands = (
            grams.filter(F.col("gram").isin(ng))
            .groupBy("doc_id")
            .agg(F.countDistinct("gram").alias("_ng"))
            .filter(F.col("_ng") == len(ng))
            .select("doc_id")
        )
        pool = docs.join(cands, "doc_id")
    else:
        pool = docs  # needle < NGRAM chars: documented full-scan fallback
    return (
        pool.select("doc_id", _occurrences(F.col(text_col), needle).alias("occ"))
        .filter(F.col("occ") > 0)
        .orderBy(F.desc("occ"), F.asc("doc_id"))
        .limit(k)
    )
