"""Distribution profiling: quantiles, source mix, cardinality, budget.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators import dedup, textstats
from searchengine_spark.entry._shared import (_TOKS_TEXT, _docs)
from searchengine_spark.entry.text import (SQL_QUALITY, _DUCK_BUCKET, _STOPLIST)


_QUANTILE_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9)


def q_quality_quantiles(spark, sf_dir):
    """Per-source EXACT quality-score percentiles (operators/profiling.py)
    — the threshold-picking profile. Exact `percentile` is the validation
    path; the mergeable GK sketch twin (`score_quantiles_approx`) is the
    100 TB path, error-pinned in tests/test_profiling.py."""
    from searchengine_spark.operators.profiling import score_quantiles

    docs = _docs(spark, sf_dir)
    scored = (
        textstats.quality_score(docs).select("doc_id", "quality")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    return score_quantiles(scored, "quality", "source",
                           probs=_QUANTILE_PROBS)


# quality formula as reusable CTE pieces (same arithmetic as SQL_QUALITY)
_QUALITY_CTE = f"""qtok AS (
  SELECT d.doc_id, {_TOKS_TEXT} AS t, coalesce(d.text, '') AS txt FROM documents d
),
qbase AS (
  SELECT doc_id,
    round(least(coalesce(len(t), 0) / 20.0, 1.0) * 0.4
      + (CASE WHEN length(txt) > 0
              THEN length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))::DOUBLE / length(txt)
              ELSE 0.0 END) * 0.4
      + least((CASE WHEN coalesce(len(t), 0) > 0
                    THEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t)
                    ELSE 0.0 END) * 5.0, 1.0) * 0.2, 6) AS quality
  FROM qtok
)"""


SQL_QUALITY_QUANTILES = f"""WITH {_QUALITY_CTE},
qd AS (SELECT b.quality, d.source FROM qbase b JOIN documents d USING (doc_id)),
agg AS (SELECT source,
        quantile_cont(quality, [{', '.join(str(p) for p in _QUANTILE_PROBS)}]) AS qs
        FROM qd GROUP BY 1)
SELECT source, round(p.pct, 6) AS pct, round(qs[p.i], 5) AS value
FROM agg CROSS JOIN (VALUES {', '.join(f'({i + 1}, {p})' for i, p in enumerate(_QUANTILE_PROBS))}) p(i, pct)"""


def q_source_mix(spark, sf_dir):
    """Mixture-weighted deterministic downsampling (operators/mixing.py):
    target = 20% for the first source, the rest uniform; the binding
    source keeps 100%, every other is hash-bucket downsampled so the KEPT
    corpus matches the target weights. One tiny per-source count agg +
    a stateless row filter."""
    from searchengine_spark.operators.mixing import mix_sources

    docs = _docs(spark, sf_dir)
    sources = sorted(r["source"] for r in
                     docs.select("source").distinct().collect())
    heavy, n = sources[0], len(sources)
    target = {s: (0.2 if s == heavy else 0.8 / (n - 1)) for s in sources}
    out = mix_sources(docs, target, salt="mix-v1")
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "source")


# Same arithmetic, same order of float ops (w*t/c), floor NOT round for the
# bucket threshold (Spark's cast-to-long truncates; DuckDB CAST rounds).
SQL_SOURCE_MIX = f"""WITH ns AS (SELECT count(DISTINCT source)::BIGINT AS n FROM documents),
heavy AS (SELECT min(source) AS h FROM documents),
cnt AS (SELECT source, count(*)::BIGINT AS c FROM documents GROUP BY 1),
w AS (SELECT source, c,
        CASE WHEN source = h THEN 0.2 ELSE 0.8 / (n - 1) END AS w
      FROM cnt, ns, heavy),
tt AS (SELECT min(c / w) AS t FROM w),
fr AS (SELECT source, least(w * t / c, 1.0) AS f FROM w, tt)
SELECT d.doc_id::BIGINT AS doc_id, d.source
FROM documents d JOIN fr USING (source)
WHERE {_DUCK_BUCKET.format(salt='mix-v1')} < floor(f * 10000)::BIGINT"""





def q_quality_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling (operators/sampling.py
    weighted_sample): each doc kept with probability == its quality score
    — the "data diet" curriculum move — decided by the content-stable
    hash bucket, so membership is reproducible across runs and engines."""
    from searchengine_spark.operators.sampling import weighted_sample

    scored = textstats.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality")
    return weighted_sample(scored, "quality", salt="wsample-v1").select(
        F.col("doc_id").cast("long").alias("doc_id"))


SQL_QUALITY_WEIGHTED_SAMPLE = f"""WITH {_QUALITY_CTE}
SELECT doc_id::BIGINT AS doc_id FROM qbase
WHERE {_DUCK_BUCKET.format(salt='wsample-v1')} < floor(quality * 10000)::BIGINT"""


def q_source_term_cardinality(spark, sf_dir):
    """Per-source EXACT distinct-term counts (operators/profiling.py) —
    the vocabulary-size profile. Exact countDistinct is the validation
    path; the HLL++ twin (approx=True, one mergeable agg, O(1/rsd²)
    state) is the 100 TB path, error-pinned in pytest."""
    from searchengine_spark.operators.profiling import group_cardinality

    toks = (
        dedup.with_tokens(_docs(spark, sf_dir))
        .select("source", F.explode("tokens").alias("term"))
    )
    return group_cardinality(toks, "source", "term", approx=False)


SQL_SOURCE_TERM_CARDINALITY = f"""WITH tokd AS (
  SELECT source, {_TOKS_TEXT} AS t FROM documents),
toks AS (SELECT source, unnest(t) AS term FROM tokd)
SELECT source, count(DISTINCT term)::BIGINT AS n_distinct
FROM toks GROUP BY 1"""


_BUDGET_TOKENS = 800


def q_budget_select(spark, sf_dir):
    """Token-budget corpus selection (operators/packing.py
    budget_select): quality-ranked greedy prefix under a token budget —
    the "best N tokens" curation step. Two-phase prefix sum, no global
    window."""
    from searchengine_spark.operators.packing import budget_select

    qs = textstats.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    return budget_select(qs, _BUDGET_TOKENS, len_col="n_tokens")


SQL_BUDGET_SELECT = f"""WITH {_QUALITY_CTE},
qn AS (SELECT doc_id, coalesce(len(t), 0)::BIGINT AS n_tokens FROM qtok),
j AS (SELECT b.doc_id, b.quality, n.n_tokens FROM qbase b JOIN qn n USING (doc_id)),
w AS (SELECT doc_id, quality, n_tokens,
        sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM j)
SELECT doc_id, quality, n_tokens, cum_tokens FROM w
WHERE cum_tokens <= {_BUDGET_TOKENS}
ORDER BY quality DESC, doc_id ASC"""
