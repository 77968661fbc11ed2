"""Similarity search: cosine/LSH/IVF/PQ ANN, embedding dup pairs, MMR.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators import dedup, similarity
from searchengine_spark.entry._shared import (_load)


def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        _load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


def q_cosine_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


SQL_COSINE_TOPK = """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10"""


def q_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN (k-means coarse quantizer -> probe nearest lists ->
    exact re-rank). Probing ALL lists is exactly brute-force cosine top-k,
    which is what the SQL oracle checks — so the gate exercises the real
    quantizer-train + assign + probe plumbing against an exact expected
    answer; recall at nprobe < n_centroids is pinned by pytest
    (test_ivf_recall_*). Query = embeddings[vec_id=1] (cosine_topk uses 0)."""
    emb = _load(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 1).select("embedding").first()
    q = [float(x) for x in row["embedding"]]
    return similarity.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=16)


SQL_IVF_TOPK = """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
c AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10"""


def q_ann_topk(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.ann_topk(
        emb, _query_vec(spark, sf_dir), k=10, n_planes=16, n_bands=4, seed=42
    )


def _ann_topk_sql(sf_dir: str) -> str:
    """Planes + query signature are deterministic (seed=42); the query vector
    is embeddings[vec_id=0]. Generates the plane weights as VALUES rows."""
    import numpy as np

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pdf = tbl.to_pandas()
    qv = np.array(pdf.loc[pdf.vec_id == 0, "embedding"].iloc[0], dtype=np.float64)
    dim = len(qv)
    planes = similarity._planes(dim, 16, 42)
    qsig = 0
    for i in range(16):
        if float(qv @ planes[i]) > 0:
            qsig |= 1 << i
    vals = ", ".join(
        f"({p}, {i + 1}, {planes[p][i]!r})" for p in range(16) for i in range(dim)
    )
    bands = " OR ".join(
        f"((sig >> {b * 4}) & 15) = {(qsig >> (b * 4)) & 15}" for b in range(4)
    )
    return f"""WITH planes(p, i, w) AS (VALUES {vals}),
dots AS (SELECT e.vec_id, pl.p, sum(e.embedding[pl.i]::DOUBLE * pl.w) AS d
         FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2),
sigs AS (SELECT vec_id, sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS sig
         FROM dots GROUP BY 1),
cand AS (SELECT vec_id FROM sigs WHERE {bands}),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
             i -> e.embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))) AS cos
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
)
SELECT vec_id, round(cos, 6) AS cos FROM c ORDER BY cos DESC, vec_id ASC LIMIT 10"""


# 0.40 yields ~30 pairs at sf0.01 (and non-empty results at sf0.001/0.1),
# so the candidate join + cosine verify are actually exercised — a 0-row
# vs 0-row "pass" proves nothing (round-1 advice).
_COS_PAIR_THRESHOLD = 0.40


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs: LSH-banded candidates + exact
    cosine verify (the embedding member of the dedup family). Output cos
    re-rounded to 5 decimals: a 64-term float64 dot product summed in
    different orders (Spark vs DuckDB) can land on opposite sides of a
    6th-decimal rounding boundary (observed once at sf0.1)."""
    emb = _load(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_pairs(
        emb, threshold=_COS_PAIR_THRESHOLD, n_planes=16, n_bands=4, seed=42
    )
    return pairs.select("id_a", "id_b", F.round("cos", 5).alias("cos"))


def _embedding_dup_pairs_sql(sf_dir: str) -> str:
    """Oracle replicates the deterministic LSH planes (seed=42) as VALUES
    rows, the band-match candidate join, and the exact cosine filter."""
    import numpy as np  # noqa: F401

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    dim = len(tbl.column("embedding")[0])
    planes = similarity._planes(dim, 16, 42)
    vals = ", ".join(
        f"({p}, {i + 1}, {planes[p][i]!r})" for p in range(16) for i in range(dim)
    )
    return f"""WITH planes(p, i, w) AS (VALUES {vals}),
dots AS (SELECT e.vec_id, pl.p, sum(e.embedding[pl.i]::DOUBLE * pl.w) AS d
         FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2),
sigs AS (SELECT vec_id, sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS sig
         FROM dots GROUP BY 1),
bands AS (SELECT vec_id, b.band, (sig >> (b.band * 4)) % 16 AS key
          FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         WHERE a.vec_id < b.vec_id),
pairs AS (
  SELECT c.id_a, c.id_b,
    round(list_sum(list_transform(range(1, len(ea.embedding) + 1),
            i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(eb.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cos
  FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a
              JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, round(cos, 5) AS cos FROM pairs
WHERE cos >= {_COS_PAIR_THRESHOLD}"""


def q_embedding_dup_components(spark, sf_dir):
    """Embedding near-dup CLUSTERS: the LSH-candidates + cosine-verify
    pair graph resolved to keep-one components (dedup.py
    connected_components over similarity.cosine_pairs) — the decision
    stage of embedding dedup."""
    emb = _load(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_pairs(
        emb, threshold=_COS_PAIR_THRESHOLD, n_planes=16, n_bands=4, seed=42
    )
    comp = dedup.connected_components(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


def _embedding_dup_components_sql(sf_dir: str) -> str:
    """Recursive-CTE components over the SAME pair derivation as
    _embedding_dup_pairs_sql (WITH body reused verbatim; only the final
    SELECT is replaced by edges + min-label reachability)."""
    base = _embedding_dup_pairs_sql(sf_dir)
    body, _ = base.rsplit("SELECT id_a, id_b,", 1)
    return f"""{body.rstrip().replace("WITH planes", "WITH RECURSIVE planes", 1)},
prs AS (SELECT id_a, id_b FROM pairs WHERE cos >= {_COS_PAIR_THRESHOLD}),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.label
)
SELECT node::BIGINT AS vec_id, min(label)::BIGINT AS component,
       (node = min(label)) AS keep
FROM reach GROUP BY node"""


def q_pq_topk(spark, sf_dir):
    """PQ-ADC ANN (similarity.py pq_topk): codebook-train + encode +
    asymmetric-distance candidate scan (m JVM array lookups per row over
    the m-byte codes — 16x smaller than the raw vectors) + exact re-rank
    of the top-100 (verified rank-identical to brute force at sf0.001,
    0.01, AND 0.1). At this corpus/config the candidate margin covers the
    quantization error, so the result is rank-identical to brute force —
    the exact SQL oracle; recall honesty is pinned in pytest."""
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.pq_topk(emb, _query_vec(spark, sf_dir), k=10)


_MMR_K = 10
_MMR_POOL = 30
_MMR_LAM = 0.7


def q_mmr_topk(spark, sf_dir):
    """MMR-diversified top-k (operators/similarity.py mmr_topk): exact
    cosine pool (distributed) + greedy maximal-marginal-relevance
    selection over the pool-row candidate set. Query = embeddings[0],
    itself excluded."""
    emb = _load(spark, sf_dir, "embeddings")
    return similarity.mmr_topk(emb, _query_vec(spark, sf_dir), k=_MMR_K,
                               pool=_MMR_POOL, lam=_MMR_LAM,
                               exclude_ids=(0,))


SQL_MMR_TOPK = f"""WITH RECURSIVE
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT vec_id, embedding,
    round(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))), 5) AS rel
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
),
pool AS (SELECT vec_id, embedding, rel FROM c ORDER BY rel DESC, vec_id ASC LIMIT {_MMR_POOL}),
sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 5) AS sim
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
sel AS (
  SELECT * FROM (
    SELECT 1 AS rank, vec_id, rel, [vec_id] AS picked
    FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1
  )
  UNION ALL
  SELECT s.rank + 1, nxt.vec_id, nxt.rel, list_append(s.picked, nxt.vec_id)
  FROM sel s, LATERAL (
    SELECT p.vec_id, p.rel
    FROM pool p
    WHERE NOT list_contains(s.picked, p.vec_id)
    ORDER BY round({_MMR_LAM} * p.rel - {round(1.0 - _MMR_LAM, 10)} *
        (SELECT max(sim) FROM sims WHERE ia = p.vec_id AND list_contains(s.picked, ib)), 5) DESC,
      p.vec_id ASC
    LIMIT 1
  ) nxt
  WHERE s.rank < {_MMR_K}
)
SELECT rank, vec_id, rel FROM sel ORDER BY rank ASC"""
