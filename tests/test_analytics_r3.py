"""Round-3 result-set analytics: significant terms, rank evaluation,
histogram facets.

Semantics pinned on planted corpora (hand-computed JLH / nDCG values);
the cross-engine DuckDB oracles live in entry_queries
(significant_terms / rank_eval / facet_histogram gate rows).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.facets import facet_histogram
from searchengine_spark.operators.forward import (
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.rankeval import rank_eval
from searchengine_spark.operators.sigterms import significant_terms

# docs 0-3 are the "foreground" topic (apple + zebra together), docs 4-9
# background; "the" is everywhere (no lift), "zebra" only in the hits.
_DOCS = [
    (0, "apple zebra the one"),
    (1, "apple zebra the two"),
    (2, "apple zebra the three"),
    (3, "apple the four"),
    (4, "the banana five"),
    (5, "the banana six"),
    (6, "the banana seven"),
    (7, "the cherry eight"),
    (8, "the cherry nine"),
    (9, "the cherry ten"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    tf = explode_forward(build_forward(docs))
    stats = build_term_stats(tf)
    return docs, tf, stats


def _jlh(fg_df, fg_size, df, n):
    fg_pct, bg_pct = fg_df / fg_size, df / n
    return round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)


def test_significant_terms_jlh(spark, corpus):
    _, tf, stats = corpus
    hits = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    out = {r.term: r for r in
           significant_terms(tf, stats, 10, hits, n_top=50,
                             min_doc_count=2).collect()}
    # zebra: fg 3/4 vs bg 3/10 — the set's defining term
    assert out["zebra"].fg_df == 3 and out["zebra"].df == 3
    assert out["zebra"].score == pytest.approx(_jlh(3, 4, 3, 10), abs=1e-6)
    # apple: perfect foreground term, even higher lift
    assert out["apple"].score == pytest.approx(_jlh(4, 4, 4, 10), abs=1e-6)
    # "the" is corpus-wide: fg_pct == bg_pct == 1 -> zero significance
    assert out["the"].score == 0.0
    # background-only terms never appear; min_doc_count drops 1-doc terms
    assert "banana" not in out and "one" not in out
    # ranking: apple (1.0 fg) above zebra above the
    ordered = [r.term for r in
               significant_terms(tf, stats, 10, hits, n_top=3,
                                 min_doc_count=2).collect()]
    assert ordered == ["apple", "zebra", "the"]


def test_significant_terms_empty_hits(spark, corpus):
    _, tf, stats = corpus
    hits = spark.createDataFrame([], "doc_id long")
    assert significant_terms(tf, stats, 10, hits).collect() == []


def test_rank_eval_perfect_and_disjoint(spark):
    # query 0: ranking exactly matches judgments -> ndcg 1, mrr 1
    # query 1: ranking hits nothing judged -> all zeros
    # query 2: relevant doc at rank 2 only
    ranking = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12),
         (1, 1, 20), (1, 2, 21),
         (2, 1, 30), (2, 2, 31)],
        "query_id int, rank int, doc_id long")
    judgments = spark.createDataFrame(
        [(0, 10, 3), (0, 11, 2), (0, 12, 1),
         (1, 99, 3),
         (2, 31, 2)],
        "query_id int, doc_id long, rel int")
    out = {r.query_id: r for r in rank_eval(ranking, judgments, k=3).collect()}

    assert out[0].ndcg == pytest.approx(1.0, abs=1e-6)
    assert out[0].mrr == 1.0
    assert out[0].p_at_k == pytest.approx(1.0, abs=1e-6)

    assert out[1].ndcg == 0.0 and out[1].mrr == 0.0 and out[1].p_at_k == 0.0

    dcg = (2**2 - 1) / math.log2(3)          # rel 2 at rank 2
    idcg = (2**2 - 1) / math.log2(2)         # ideal: rel 2 at rank 1
    assert out[2].ndcg == pytest.approx(round(dcg / idcg, 6), abs=1e-6)
    assert out[2].mrr == 0.5
    assert out[2].p_at_k == pytest.approx(round(1 / 3, 6), abs=1e-6)


def test_rank_eval_swapped_order_lowers_ndcg(spark):
    """Putting the lower-graded doc first must cost nDCG but not P@k."""
    good = spark.createDataFrame([(0, 1, 10), (0, 2, 11)],
                                 "query_id int, rank int, doc_id long")
    bad = spark.createDataFrame([(0, 1, 11), (0, 2, 10)],
                                "query_id int, rank int, doc_id long")
    judgments = spark.createDataFrame([(0, 10, 3), (0, 11, 1)],
                                      "query_id int, doc_id long, rel int")
    g = rank_eval(good, judgments, k=2).collect()[0]
    b = rank_eval(bad, judgments, k=2).collect()[0]
    assert g.ndcg == pytest.approx(1.0, abs=1e-6)
    assert b.ndcg < g.ndcg
    assert g.p_at_k == b.p_at_k == 1.0


def test_facet_histogram_buckets(spark):
    hits = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    # docs 0-2 in hour bucket 0, 3 in bucket 1; doc 4 has NULL ts;
    # doc 99 (bucket 7) is NOT a hit and must not appear
    attr = spark.createDataFrame(
        [(0, 10.0), (1, 3599.0), (2, 0.0), (3, 3600.0), (4, None),
         (99, 25200.0)],
        "doc_id long, ts_s double")
    rows = facet_histogram(hits, attr, 3600.0).collect()
    got = {(r.bucket, r.bucket_start): r.n for r in rows}
    assert got == {(0, 0.0): 3, (1, 3600.0): 1, (None, None): 1}
    # NULL bucket sorts last
    assert rows[-1].bucket is None


def test_facet_histogram_origin_shift(spark):
    hits = spark.createDataFrame([(0,), (1,)], "doc_id long")
    attr = spark.createDataFrame([(0, 100.0), (1, 160.0)],
                                 "doc_id long, ts_s double")
    rows = facet_histogram(hits, attr, 60.0, origin=100.0).collect()
    assert [(r.bucket, r.bucket_start, r.n) for r in rows] == [
        (0, 100.0, 1), (1, 160.0, 1)]


# -- percolation ------------------------------------------------------------

def test_percolate_and_vs_or(spark):
    from searchengine_spark.operators.percolate import (
        compile_queries,
        percolate,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"),
         (1, "alpha alpha alpha"),      # multiplicity counts once
         (2, "beta delta"),
         (3, "unrelated words")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "delta")], "query_id int, query string")

    # AND semantics (default): q0 needs alpha AND beta
    hits = percolate(docs, compile_queries(queries)).collect()
    got = {(r.doc_id, r.query_id): (r.n_matched, r.n_required) for r in hits}
    assert got == {(0, 0): (2, 2), (2, 1): (1, 1)}

    # OR semantics: msm=1 — doc 1's triple alpha still counts once
    hits1 = percolate(docs, compile_queries(queries, min_should_match=1))
    got1 = {(r.doc_id, r.query_id): r.n_matched for r in hits1.collect()}
    assert got1 == {(0, 0): 2, (1, 0): 1, (2, 0): 1, (2, 1): 1}


def test_percolate_shuffle_fallback_identical(spark):
    """A rule set reported larger than BROADCAST_RULE_LIMIT drops the
    broadcast hint (shuffle hash join on term) yet yields the identical
    triggered (doc, query) pairs — and the broadcast really is gone
    from the physical plan."""
    from searchengine_spark.operators.percolate import (
        BROADCAST_RULE_LIMIT,
        compile_queries,
        percolate,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta delta"), (2, "nothing here")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "delta"), (2, "gamma beta")],
        "query_id int, query string")
    compiled = compile_queries(queries, min_should_match=1)

    # Disable size-based auto-broadcast: at test scale AQE would
    # otherwise re-plan the hintless join back to broadcast and the
    # shuffle path would never execute. The explicit broadcast() hint
    # on the small path survives threshold=-1, so both shapes run.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = percolate(docs, compiled)  # default -> broadcast, no sizing count
        big = percolate(docs, compiled, n_rules=BROADCAST_RULE_LIMIT + 1)
        rows_small = sorted(map(tuple, small.collect()))
        rows_big = sorted(map(tuple, big.collect()))
        assert rows_small == rows_big and rows_big

        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_percolate_msm_clamps(spark):
    from searchengine_spark.operators.percolate import (
        compile_queries,
        percolate,
    )

    docs = spark.createDataFrame([(0, "alpha beta")],
                                 "doc_id long, text string")
    queries = spark.createDataFrame([(0, "alpha")],
                                    "query_id int, query string")
    # msm=5 > the query's 1 term -> clamps to 1, still matches
    out = percolate(docs, compile_queries(queries, min_should_match=5))
    assert [(r.doc_id, r.query_id) for r in out.collect()] == [(0, 0)]


def test_percolate_stream_equals_batch(spark, tmp_path_factory):
    from searchengine_spark.operators.percolate import (
        compile_queries,
        percolate,
        percolate_stream,
    )
    from searchengine_spark.sources.synth import transcripts_df

    base = tmp_path_factory.mktemp("perc")
    in_dir, out_dir, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))

    docs = transcripts_df(spark, n_convs=30, seed=7, partitions=2)
    docs.write.mode("overwrite").parquet(in_dir)

    queries = spark.createDataFrame(
        [(0, docs.select("text").first()["text"].split()[0])],
        "query_id int, query string")
    compiled = compile_queries(queries, min_should_match=1)

    q = percolate_stream(spark, in_dir, compiled, out_dir, ckpt)
    q.awaitTermination(120)

    got = sorted(
        (r.doc_id, r.query_id)
        for r in spark.read.parquet(out_dir).collect())
    want = sorted(
        (r.doc_id, r.query_id)
        for r in percolate(
            spark.read.parquet(in_dir).withColumn(
                "doc_id", F.xxhash64("conv_id", "turn_idx")),
            compiled).collect())
    assert got == want and got
