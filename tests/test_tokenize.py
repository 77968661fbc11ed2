"""Tokenizer goldens (reference semantics: Indexer/Program.cs:94-121) and
agreement across the pure-Python / pandas-UDF / SQL implementations."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import (
    spark_tokens_sql,
    term_counts_py,
    tokenize_py,
    tokenize_udf,
)

GOLDEN = [
    ("don't stop", ["don", "t", "stop"]),
    ("café au lait", ["au", "lait"]),  # non-ASCII letter kills whole token
    ("naïve approach", ["approach"]),
    ("abc123def", ["abc", "def"]),  # digits separate
    ("Upper CASE", ["upper", "case"]),
    ("pneumonoultramicroscopicsilicovolcanoconiosis ok", ["ok"]),  # >20 dropped
    ("aaaaaaaaaaaaaaaaaaaa", ["aaaaaaaaaaaaaaaaaaaa"]),  # exactly 20 kept
    ("aaaaaaaaaaaaaaaaaaaaa", []),  # 21 dropped
    ("", []),
    ("   ", []),
    ("42 7x --", ["x"]),
    ("a-b_c", ["a", "b", "c"]),  # underscore is not a letter
]


def test_golden_python():
    for text, want in GOLDEN:
        assert tokenize_py(text) == want, text


def test_term_counts():
    c = term_counts_py("the the the of of a")
    assert dict(c) == {"the": 3, "of": 2, "a": 1}


def test_udf_matches_python(spark):
    texts = [t for t, _ in GOLDEN] + [None]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(tokenize_udf("text").alias("toks")).collect()
    want = [tokenize_py(t) for t in texts]
    assert [r["toks"] for r in got] == want


def test_sql_matches_python(spark):
    texts = [t for t, _ in GOLDEN]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(F.expr(spark_tokens_sql("text")).alias("toks")).collect()
    want = [tokenize_py(t) for t in texts]
    assert [r["toks"] for r in got] == want


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_invariants(text):
    toks = tokenize_py(text)
    for t in toks:
        assert 1 <= len(t) <= 20
        assert t.isascii() and t.isalpha() and t == t.lower()
