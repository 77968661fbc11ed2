"""Round-3b operators: S-stemmer analyzer, trigram substring search,
per-doc term vectors. Semantics pinned on planted corpora; cross-engine
DuckDB oracles live in entry_queries (stemmed_topk / substring_search /
term_vectors gate rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.analyzers import (
    STEM_CASE_SQL,
    stem_py,
    stem_tf,
    stemmed_topk,
    stop_filter,
)
from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.substring import (
    doc_trigrams,
    needle_grams,
    substring_search,
)
from searchengine_spark.operators.termvectors import term_vectors

# ---------------------------------------------------------------------------
# S-stemmer
# ---------------------------------------------------------------------------

# (surface, stem) — every rule and every exception branch
_STEM_CASES = [
    ("tables", "table"),       # rule 2: *es (plain)
    ("queries", "query"),      # rule 1: *ies -> *y
    ("eies", "eies"),          # rule 1 exception — rule DECIDES, no cascade
    ("aies", "aies"),          # rule 1 exception
    ("joins", "join"),         # rule 3: *s
    ("sessions", "session"),   # rule 3
    ("classes", "classe"),     # rule 2 ('sses' hits *es first, drop one s)
    ("aes", "aes"),            # rule 2 exception
    ("trees", "trees"),        # rule 2 exception (*ees)
    ("goes", "goes"),          # rule 2 exception (*oes)
    ("basis", "basi"),         # rule 3 ('is' not excluded)
    ("bus", "bus"),            # rule 3 exception (*us)
    ("class", "class"),        # rule 3 exception (*ss)
    ("table", "table"),        # no rule
    ("ies", "y"),              # boundary: the suffix alone
]


def test_stem_py_rules():
    for surface, want in _STEM_CASES:
        assert stem_py(surface) == want, surface


def test_stem_sql_matches_python(spark):
    """The portable CASE expression is the Python mirror, exactly —
    in Spark SQL and in DuckDB."""
    import duckdb

    df = spark.createDataFrame([(s,) for s, _ in _STEM_CASES], "term string")
    got = {
        r.term: r.stem
        for r in df.select(
            "term", F.expr(STEM_CASE_SQL.format(c="term")).alias("stem")
        ).collect()
    }
    assert got == {s: stem_py(s) for s, _ in _STEM_CASES}

    con = duckdb.connect()
    for s, want in _STEM_CASES:
        expr = STEM_CASE_SQL.format(c=f"'{s}'")
        assert con.execute(f"SELECT {expr}").fetchone()[0] == want, s


def test_stemmed_topk_recall(spark):
    """'tables' retrieves singular-only docs; plain BM25 cannot."""
    docs = spark.createDataFrame(
        [
            (0, "table table table"),
            (1, "tables once"),
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    forward = build_forward(docs)
    tf = explode_forward(forward)
    scalars = CorpusScalars.compute(forward)

    got = stemmed_topk(tf, scalars, "tables", k=10).collect()
    ids = [r.doc_id for r in got]
    assert set(ids) == {0, 1}
    # doc 0 has tf=3 of the stem -> higher score
    assert ids[0] == 0

    # stem df: 'table' appears (any form) in 2 docs of 3
    tfs = stem_tf(tf)
    stats = {r.term: r for r in build_term_stats(tfs).collect()}
    assert stats["table"].df == 2 and stats["table"].cf == 4


def test_stem_tf_preserves_dl(spark):
    docs = spark.createDataFrame([(0, "tables table")], "doc_id long, text string")
    tf = explode_forward(build_forward(docs))
    row = stem_tf(tf).collect()
    assert len(row) == 1 and row[0].tf == 2 and row[0].dl == 2


def test_stop_filter(spark):
    docs = spark.createDataFrame([(0, "the spark the join")], "doc_id long, text string")
    tf = explode_forward(build_forward(docs))
    kept = {r.term for r in stop_filter(tf, ["the", "a"]).collect()}
    assert kept == {"spark", "join"}
    # dl untouched (Lucene norm semantics)
    assert stop_filter(tf, ["the"]).select("dl").first().dl == 4


# ---------------------------------------------------------------------------
# trigram substring search
# ---------------------------------------------------------------------------


def test_needle_grams():
    assert needle_grams("oin f") == sorted({"oin", "in ", "n f"})
    assert needle_grams("ab") == []  # too short for the gram index


def test_substring_search_counts_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (0, "xx ERROR yy error zz"),   # 2 occurrences (case-folded)
            (1, "one error here"),          # 1
            (2, "erro r near miss"),        # 0
            (3, "errorerror run-on"),       # 2 (non-overlapping)
        ],
        "doc_id long, text string",
    )
    got = [(r.doc_id, r.occ) for r in substring_search(docs, "error", k=10).collect()]
    assert got == [(0, 2), (3, 2), (1, 1)]


def test_substring_index_path_equals_scan_path(spark):
    """Candidates from the gram index + verify == the ground-truth LIKE
    scan (the oracle claim, asserted here on an adversarial corpus where
    all grams appear but never contiguously)."""
    docs = spark.createDataFrame(
        [
            (0, "abcdef"),          # contains 'cde'
            (1, "abc def cde x"),   # contains 'cde' (standalone)
            (2, "ab cd ef"),        # has no trigram of 'cde'
            (3, "cd + de but never the full gram"),  # partial grams only
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.occ) for r in substring_search(docs, "cde", k=10).collect()}
    assert got == {(0, 1), (1, 1)}


def test_substring_short_needle_fallback(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "bb")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.occ) for r in substring_search(docs, "a", k=10).collect()}
    assert got == {(0, 2)}


def test_trigram_index_prunes_to_needle_grams(spark):
    """The gram filter reaches the index relation (pushed-down IN) —
    candidates are computed from the needle's grams only."""
    docs = spark.createDataFrame(
        [(0, "hello shuffle world")], "doc_id long, text string"
    )
    grams = doc_trigrams(docs)
    plan = substring_search(
        docs, "shuffle", k=5, grams=grams
    )._jdf.queryExecution().executedPlan().toString()
    assert "gram" in plan  # the index relation participates
    # the candidate filter lands as an IN over the needle's grams
    assert plan.count("shu") >= 1


# ---------------------------------------------------------------------------
# term vectors
# ---------------------------------------------------------------------------


def test_term_vectors_positions_and_stats(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark join spark"),
            (1, "join fast"),
        ],
        "doc_id long, text string",
    )
    stats = build_term_stats(explode_forward(build_forward(docs)))
    got = {r.term: r for r in term_vectors(docs, stats, 0).collect()}
    assert set(got) == {"spark", "join"}
    assert (got["spark"].tf, got["spark"].first_pos) == (2, 0)
    assert (got["join"].tf, got["join"].first_pos) == (1, 1)
    # corpus-level stats ride along
    assert (got["spark"].df, got["spark"].cf) == (1, 2)
    assert (got["join"].df, got["join"].cf) == (2, 2)


def test_term_vectors_empty_doc(spark):
    docs = spark.createDataFrame([(0, "123 456")], "doc_id long, text string")
    stats = build_term_stats(explode_forward(build_forward(docs)))
    assert term_vectors(docs, stats, 0).count() == 0


def test_term_vectors_pushdown(spark, tmp_path):
    """The doc_id filter reaches the parquet scan as a pushed filter."""
    docs = spark.createDataFrame(
        [(i, f"word{i} common") for i in range(20)], "doc_id long, text string"
    )
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)
    stored = spark.read.parquet(path)
    stats = build_term_stats(explode_forward(build_forward(stored)))
    plan = term_vectors(stored, stats, 7)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan


# ---------------------------------------------------------------------------
# range facets
# ---------------------------------------------------------------------------


def test_facet_ranges_overlap_zero_and_unbounded(spark):
    """ES range-agg semantics: overlapping ranges double-count, requested
    empty ranges are emitted at 0, None bounds are unbounded, NULL
    attribute values count nowhere."""
    from searchengine_spark.operators.facets import facet_ranges

    hits = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    attrs = spark.createDataFrame(
        [(0, 10.0), (1, 150.0), (2, 250.0), (3, 250.0), (4, None)],
        "doc_id long, v double",
    )
    out = {r.key: r for r in facet_ranges(
        hits, attrs,
        [("lo", None, 200.0), ("hi", 100.0, None),  # overlap at 150
         ("empty", 9999.0, None)], attr="v").collect()}
    assert out["lo"].n == 2          # 10, 150
    assert out["hi"].n == 3          # 150, 250, 250 (150 double-counted)
    assert out["empty"].n == 0       # requested -> emitted at 0
    assert out["lo"].range_from is None and out["hi"].range_to is None
    # doc 4 (NULL v) appears in no range: 2 + 3 + 0 counts 4 docs' values
