"""Scoring formulas as pure Column arithmetic (JVM-side, codegen-fused).

Two scorer modes (SURVEY.md §2.9):

- ``bm25``      — standard Okapi BM25 (the north-star primary scorer):
                  idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)
                  w(t,d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                  score(d) = sum_t qf_t * w(t,d)
- ``reference`` — the reference engine's additive tf*(N/cf) weighting
                  (SearchEngine Engine/Engine/Engine.cs:151,172):
                  w(t,d) = tf / (cf_t / N) * qf_t
                  with per-term posting lists capped to the 1000 highest-tf
                  entries before scoring (Engine.cs:185,193).

Tie-break everywhere: (score desc, doc_id asc) — the reference's unstable
quicksort makes tf-ties nondeterministic (DataStructs/Functions.cs:59,79);
we pin them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
REFERENCE_POSTING_CAP = 1000


def idf_col(df_col: Column, n_docs: int) -> Column:
    """BM25 idf as a Column."""
    return F.log(
        (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0)
    )


def bm25_weight(tf_col: Column, dl_col: Column, idf: Column, avgdl: float,
                k1: float = K1, b: float = B) -> Column:
    """Per-(term, doc) BM25 partial weight."""
    denom = tf_col + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col / F.lit(float(avgdl)))
    return idf * (tf_col * F.lit(k1 + 1.0)) / denom


def reference_weight(tf_col: Column, cf_col: Column, n_docs: int) -> Column:
    """Reference engine body-score partial: tf / (cf/N)."""
    return tf_col / (cf_col / F.lit(float(n_docs)))


LM_MU = 2000.0  # Dirichlet prior mass (Zhai & Lafferty's recommended range)


def lm_dirichlet_partial(tf_col: Column, cf_col: Column,
                         total_tokens: int, mu: float = LM_MU) -> Column:
    """Matched-term partial of the rank-equivalent Dirichlet query
    likelihood (Zhai & Lafferty 2001):

        log p(q|d) ~rank~ sum_{t in q∩d} qf_t * ln(1 + tf / (mu * p(t|C)))
                          + |q| * ln(mu / (dl + mu))

    with p(t|C) = cf_t / total_tokens. This is the sparse-index-friendly
    form: only postings of MATCHED terms contribute the sum; the second
    addend is per-document and is attached after the hash-agg
    (operators/topk.py lm_dirichlet_topk). Pure Column arithmetic."""
    p_c = cf_col.cast("double") / F.lit(float(total_tokens))
    return F.log(F.lit(1.0) + tf_col / (F.lit(float(mu)) * p_c))


# Pure-Python twins (used by the single-node oracle + inside WAND UDF) ------

def idf_py(df: int, n_docs: int) -> float:
    import math

    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_weight_py(tf: float, dl: float, idf: float, avgdl: float,
                   k1: float = K1, b: float = B) -> float:
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def reference_weight_py(tf: float, cf: float, n_docs: int) -> float:
    return tf / (cf / float(n_docs))
