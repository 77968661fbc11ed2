"""Train/eval decontamination: which held-out documents share n-gram
shingles with the training split?

The standard eval-hygiene pass for LLM training sets (n-gram-overlap
decontamination, e.g. 8-gram): a test document that shares enough
shingles with any train document is contaminated and must be dropped or
re-split. Composes two operators this engine already has — deterministic
hash-keyed splits (sampling.split_assign) and shingling (dedup
doc_shingles) — into the cross-split inverted-index join.

Scale shape: the join is shingle-keyed (candidates only materialize for
docs that actually share a shingle — never all-pairs), and
``max_shingle_df`` drops boilerplate shingles that appear in more than
df docs BEFORE the join (a too-common shingle contributes no
contamination signal but quadratic join rows; the same guard every
production decontaminator applies). Output is per-test-doc aggregated,
so the result is test-split-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import doc_shingles
from searchengine_spark.operators.sampling import split_assign


def cross_split_contamination(
    docs: DataFrame,
    k_shingle: int = 3,
    train_split: str = "train",
    eval_splits: tuple[str, ...] = ("val", "test"),
    max_shingle_df: int | None = None,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """-> (doc_id, split, n_shared_shingles, n_train_docs) for every
    eval-split doc sharing >= 1 shingle with any train doc.

    n_shared_shingles counts the eval doc's DISTINCT shingles seen in
    train; n_train_docs counts distinct train docs it collides with.
    """
    labeled = split_assign(docs, weights=weights, salt=salt)
    sh = doc_shingles(labeled, k=k_shingle).join(
        labeled.select("doc_id", "split"), "doc_id"
    )
    if max_shingle_df is not None:
        common = (
            sh.groupBy("shingle")
            .agg(F.count_distinct("doc_id").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(common, "shingle", "left_anti")
    train = (
        sh.filter(F.col("split") == train_split)
        .select(F.col("doc_id").alias("train_doc_id"), "shingle")
    )
    ev = sh.filter(F.col("split").isin(list(eval_splits)))
    hits = ev.join(train, "shingle")
    return (
        hits.groupBy("doc_id", "split")
        .agg(
            F.count_distinct("shingle").cast("long")
            .alias("n_shared_shingles"),
            F.count_distinct("train_doc_id").cast("long")
            .alias("n_train_docs"),
        )
    )
