"""Result snippets: a query-term context window from each document.

The reference renders results as title links only (Engine.cs:68-72,
ListItem substitution); a transcript engine must show WHERE the hit is.
``first_snippet`` is pure JVM column algebra (lower + locate +
substring inside whole-stage codegen — the text never reaches Python),
applied AFTER top-k so it touches k rows, not the corpus.

The window is centered on the FIRST occurrence of the earliest-matching
query term: deterministic, oracle-expressible (DuckDB strpos/substr),
and the common-case UX. Multi-hit highlighting (all occurrences,
best-window selection) is a rendering concern: at k rows it belongs in
the application tier, not the distributed plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_py


def _first_pos(text_lc: Column, terms: list[str]) -> Column:
    """1-based position of the earliest occurrence of any term
    (0 when none match) — min over per-term locate, ignoring misses."""
    positions = F.array(*[F.locate(t, text_lc) for t in terms])
    hit = F.filter(positions, lambda p: p > 0)
    return F.when(F.size(hit) > 0, F.array_min(hit)).otherwise(F.lit(0))


def first_snippet(docs: DataFrame, query: str, width: int = 40,
                  text_col: str = "text") -> DataFrame:
    """Add ``snip_pos`` (1-based match position, 0 = no hit) and
    ``snippet`` (a ``2*width``-char window around the first hit;
    leading ``width`` chars when no term matches)."""
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return docs.withColumn("snip_pos", F.lit(0).cast("long")) \
            .withColumn("snippet", F.substring(F.col(text_col), 1, width))
    lc = F.lower(F.col(text_col))
    pos = _first_pos(lc, terms)
    start = F.greatest(F.lit(1), pos - width)
    return (
        docs.withColumn("snip_pos", pos.cast("long"))
        .withColumn(
            "snippet",
            F.when(pos > 0,
                   F.col(text_col).substr(start, F.lit(2 * width)))
            .otherwise(F.substring(F.col(text_col), 1, width)),
        )
    )
