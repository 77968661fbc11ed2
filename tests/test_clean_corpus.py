"""clean_corpus composition: every stage must actually fire — one planted
doc per rejection reason, run through the REAL entry callable against a
temporary documents.parquet (the same read path the driver uses)."""

from __future__ import annotations

import pytest

GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "to the old stone house by the river where it can rest for a while")
OTHER = ("a long passage about the history of the small town and the many "
         "people who lived there for years with all of their own stories")


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("clean")
    rows = [
        (0, GOOD),                    # survives everything
        (1, GOOD),                    # exact dup of 0 -> keep-first drops it
        (2, "zzz qqq xxx www " * 3),  # no stopwords, short -> quality/lang
        (3, "el rapido zorro marron salta sobre el perro perezoso cada "
            "manana antes del amanecer cerca de la casa de piedra"),  # not en
        # 4/5: near-identical to each other (not to 0) -> both exceed 50%
        # duplicated-span coverage
        (4, OTHER + " " + OTHER),
        (5, OTHER + " " + OTHER + " extra"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "srcT", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.parquet(str(base / "documents.parquet"))
    return str(base)


def test_clean_corpus_stages_all_fire(spark, sf_dir):
    from searchengine_spark.entry_queries import q_clean_corpus

    kept = {r.doc_id for r in q_clean_corpus(spark, sf_dir).collect()}
    assert kept == {0}, kept
    # each doc is rejected by a DIFFERENT stage: 1 = exact keep-first dup,
    # 2 = quality/language, 3 = language, 4 & 5 = span-dup coverage > 0.5
    # (4's spans repeat internally AND occur in 5, and vice versa, while
    # doc 0's text is unique so its coverage is 0)
