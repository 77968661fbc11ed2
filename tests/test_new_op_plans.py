"""Physical-plan hygiene for the round-2 operator additions: the scale
claims in the docstrings (zero-shuffle matching, no-shuffle sampling,
pushed-down term filters on the positional index) asserted on the
actual plans, so a refactor that silently reintroduces a shuffle fails
here, not at 100 TB."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.positional import (
    build_positional,
    phrase_match,
    phrase_match_indexed,
    near_match,
)
from searchengine_spark.operators.sampling import (
    sample_deterministic,
    split_assign,
    stratified_sample,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tree(plan: str) -> str:
    """The operator-tree section (before the node details)."""
    return plan.split("\n\n")[0]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} alpha beta") for i in range(50)],
        "doc_id long, text string",
    )


def test_phrase_match_zero_shuffle(spark, docs):
    tree = _tree(_plan(phrase_match(docs, "alpha beta")))
    assert "Exchange" not in tree, tree


def test_near_match_zero_shuffle(spark, docs):
    tree = _tree(_plan(near_match(docs, "alpha", "gamma", window=4)))
    assert "Exchange" not in tree, tree


def test_sampling_zero_shuffle_and_no_udf(spark, docs):
    for df in (
        sample_deterministic(docs, 0.5),
        split_assign(docs),
        stratified_sample(docs.withColumn("lang", F.lit("en")),
                          {"en": 0.5}, "lang"),
    ):
        plan = _plan(df)
        tree = _tree(plan)
        assert "Exchange" not in tree, tree
        # pure JVM: no UDF-evaluation node anywhere in the plan
        # (the fixture's createDataFrame scan mentions Python; the
        # operators themselves must not add Eval nodes)
        assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_positional_index_query_pushes_term_filter(spark, docs, tmp_path):
    path = str(tmp_path / "posidx")
    build_positional(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    plan = _plan(phrase_match_indexed(postings, "alpha beta"))
    # each leg's term equality must reach the parquet scan
    assert "PushedFilters" in plan
    assert "EqualTo(term,alpha)" in plan.replace(" ", "").replace("'", "") \
        or "EqualTo(term, alpha)" in plan, plan


def test_positional_index_query_correct_after_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "posidx2")
    build_positional(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    got = {r.doc_id: r.ptf
           for r in phrase_match_indexed(postings, "alpha beta").collect()}
    assert len(got) == 50 and all(v == 2 for v in got.values())
