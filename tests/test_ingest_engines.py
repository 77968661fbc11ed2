"""The two tokenize engines of the fused ingest (JVM codegen default vs
Arrow pandas-UDF) must be interchangeable: identical doc ids, doc lengths,
text passthrough, tf table — and identical downstream segments."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.ingest import tf_from_doc_map, tokenized_doc_map


def _tf_set(df):
    return set(map(tuple, df.select("term", "doc_id", "tf", "dl").collect()))


def _doc_set(dm):
    return set(map(tuple, dm.select("doc_id", "conv_id", "turn_idx",
                                    "dl", "text").collect()))


def test_jvm_equals_arrow_on_edge_fixture(spark, tiny):
    """tiny has every tokenizer edge: apostrophes, non-ASCII kills, >20
    chars, digits-as-separators, empty/whitespace turns, duplicate terms."""
    a = tokenized_doc_map(tiny, num_partitions=3, tokenizer="arrow")
    j = tokenized_doc_map(tiny, num_partitions=3, tokenizer="jvm")
    assert _doc_set(a) == _doc_set(j)
    assert _tf_set(tf_from_doc_map(a)) == _tf_set(tf_from_doc_map(j))


def test_jvm_equals_arrow_on_corpus(spark, small):
    a = tokenized_doc_map(small, num_partitions=4, tokenizer="arrow")
    j = tokenized_doc_map(small, num_partitions=4, tokenizer="jvm")
    assert _doc_set(a) == _doc_set(j)
    assert _tf_set(tf_from_doc_map(a)) == _tf_set(tf_from_doc_map(j))


def test_jvm_docmap_has_no_python_stage(spark, small):
    """The JVM engine's whole point: zero Python in the text pass — the
    plan must contain no Arrow/Python evaluation node."""
    dm = tokenized_doc_map(small, num_partitions=4, tokenizer="jvm")
    plan = dm._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_unknown_engine_raises(spark, tiny):
    import pytest

    with pytest.raises(ValueError):
        tokenized_doc_map(tiny, tokenizer="rust")


def test_jvm_rle_tf_is_exact(spark):
    """Direct check of the sort+RLE tf construction on a pathological doc."""
    df = spark.createDataFrame(
        [("c", 0, "user", "b a b a b ... b!b?b 42 a", None,
          __import__("datetime").datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    dm = tokenized_doc_map(df, num_partitions=1, tokenizer="jvm")
    row = dm.select("terms", "tfs", "dl").collect()[0]
    got = dict(zip(row["terms"], row["tfs"]))
    assert got == {"a": 3, "b": 6}
    assert row["dl"] == 9
