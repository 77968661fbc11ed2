"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k  : exact baseline, pure JVM column arithmetic
  (zip_with + aggregate — no Python in the loop)
- LSH-bucketed ANN          : random-hyperplane signatures (deterministic
  seeded planes), bucket join + exact re-rank — the 100 TB scale path
  (candidates ~ bucket collisions, not the full corpus)
- embedding near-dup pairs  : cosine >= τ via LSH candidates

At cluster scale the query side is tiny -> broadcast; the corpus side
scans columnar parquet with only (id, embedding) read (column pruning).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate({a}, 0D, (acc, v) -> acc + v * v)"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k vs one query vector ->
    (id, cos) ordered (cos desc, id asc). The query vector is a literal
    array (broadcast by value into codegen)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = embeddings.withColumn("_q", q)
    cos = _dot(vec_col, "_q") / (_norm(vec_col) * _norm("_q"))
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """-> (id, sig:long): random-hyperplane signature, bit i = sign of
    dot(v, plane_i).

    ONE Arrow pass: each batch is stacked into an (n, dim) float64 matrix
    and multiplied against the broadcast-by-closure (dim, n_planes) plane
    matrix — a single BLAS matmul per batch. (The round-1 version built
    n_planes literal arrays of dim doubles as separate columns; at a real
    embedding dim of 768 that is 12k+ codegen literals and the plan itself
    becomes the bottleneck. The matmul plan is O(1) in dim and n_planes.)
    """
    planes_t = np.ascontiguousarray(_planes(dim, n_planes, seed).T)  # (dim, n_planes)
    bitvals = (1 << np.arange(n_planes)).astype(np.int64)
    fields = [embeddings.schema[id_col], T.StructField("sig", T.LongType(), False)]
    if keep_vec:
        # (id, sig, vec) IS the ANN index — bucketed vectors, like an IVF
        # posting file. Persist/write it once; queries then touch buckets
        # only, never the raw corpus.
        fields.append(embeddings.schema[vec_col])
    schema = T.StructType(fields)

    def _sig(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sig = ((m @ planes_t) > 0).astype(np.int64) @ bitvals
            out = {id_col: pdf[id_col], "sig": sig}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col).mapInPandas(_sig, schema)


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: LSH band-bucket filter -> exact cosine re-rank.

    Bands of n_planes/n_bands bits; a vector is a candidate iff it matches
    the query signature in >=1 band. Recall tested vs brute force.

    ``signatures``: a precomputed ``lsh_signatures`` table (the amortized
    ANN index; pass ``keep_vec=True`` there so candidates carry their
    vectors and the query never rescans the corpus).
    """
    dim = len(query_vec)
    sigs = signatures if signatures is not None else lsh_signatures(
        embeddings, dim, n_planes, seed, id_col, vec_col)
    planes = _planes(dim, n_planes, seed)
    qv = np.asarray(query_vec)
    qsig = 0
    for i in range(n_planes):
        if float(qv @ planes[i]) > 0:
            qsig |= 1 << i
    bits_per_band = n_planes // n_bands
    mask = (1 << bits_per_band) - 1
    cond = None
    for b in range(n_bands):
        band = (F.shiftright(F.col("sig"), b * bits_per_band) % (mask + 1))
        qband = (qsig >> (b * bits_per_band)) & mask
        c = band == F.lit(qband)
        cond = c if cond is None else (cond | c)
    if vec_col in sigs.columns:
        # index carries the vectors: re-rank candidates directly, zero
        # corpus rescans (the production query path)
        return cosine_topk(sigs.filter(cond).select(id_col, vec_col),
                           query_vec, k, id_col, vec_col)
    cands = sigs.filter(cond).select(id_col)
    return cosine_topk(
        embeddings.join(cands, id_col), query_vec, k, id_col, vec_col
    )


# -- IVF (inverted-file) ANN --------------------------------------------------
#
# The second standard ANN shape next to plane-LSH: a coarse k-means
# quantizer partitions vectors into n_centroids inverted lists; a query
# probes only the nprobe nearest lists and exact-re-ranks inside them
# (the FAISS IVF-Flat recipe, Johnson et al. 2017 — public method). At
# corpus scale the quantizer is trained on a BOUNDED sample (driver-side
# numpy Lloyd iterations on a few thousand vectors), the centroid matrix
# is tiny and broadcast by closure, and assignment is one Arrow matmul
# per batch — the same O(1)-plan-size discipline as lsh_signatures.

def _train_sample(embeddings: DataFrame, sample: int,
                  id_col: str, vec_col: str) -> list:
    """Bounded, deterministic, UNBIASED training sample: the ``sample``
    lowest rows in md5(id) order (a TakeOrdered, never a full sort).
    Hash order decorrelates the sample from id assignment — on a real
    corpus doc_ids rank by (conv_id, turn_idx), so "lowest ids" would be
    the earliest/first-source sliver and the codebooks would train on a
    non-representative slice. md5 of the id string is stable across
    reruns/partitionings, so training stays bit-deterministic (resume
    safety); the id itself is the tiebreak."""
    return (
        embeddings.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample).collect()
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the coarse quantizer -> unit-norm (n_centroids, dim) matrix.

    Deterministic: the sample is the ``sample`` first vectors in
    md5(id) hash order (see ``_train_sample`` — unbiased w.r.t. id
    assignment, still a bounded TakeOrdered), init is the first
    n_centroids sample rows, and Lloyd assignment breaks ties by lowest
    centroid index. Spherical k-means (normalize, assign by max dot) so
    assignment and query probing agree with cosine ranking."""
    rows = _train_sample(embeddings, sample, id_col, vec_col)
    m = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cent = m[:n_centroids].copy()
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):  # empty list keeps its old centroid
                cent[c] = members.sum(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = True,
) -> DataFrame:
    """-> (id, list_id[, vec]): the IVF index table. One matmul per Arrow
    batch against the closure-broadcast centroid matrix; at cluster scale
    write this partitioned by list_id so a probe reads nprobe partitions."""
    cent_t = np.ascontiguousarray(centroids.T)  # (dim, n_centroids)
    fields = [embeddings.schema[id_col],
              T.StructField("list_id", T.IntegerType(), False)]
    if keep_vec:
        fields.append(embeddings.schema[vec_col])
    schema = T.StructType(fields)

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            lists = (m @ cent_t).argmax(axis=1).astype(np.int32)
            out = {id_col: pdf[id_col], "list_id": lists}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col).mapInPandas(_assign, schema)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-Flat top-k: probe the nprobe centroid lists nearest the query,
    exact cosine re-rank inside them -> (id, cos) (cos desc, id asc).

    ``nprobe == n_centroids`` probes every list and is EXACTLY brute-force
    cosine top-k — the contract the driver gate checks against the plain
    SQL oracle (so the quantizer-train + assign + probe plumbing is
    exercised with an exact expected answer); recall at nprobe < n_centroids
    is asserted separately in tests. Pass a persisted ``ivf_assign`` table
    as ``index`` (with its ``centroids``) to amortize across queries."""
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, sample,
                                  id_col=id_col, vec_col=vec_col)
    idx = index if index is not None else ivf_assign(
        embeddings, centroids, id_col, vec_col, keep_vec=True)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q), kind="stable")
    probe = [int(c) for c in order[:nprobe]]
    cand = idx.filter(F.col("list_id").isin(probe))
    if vec_col in idx.columns:
        return cosine_topk(cand.select(id_col, vec_col), query_vec, k,
                           id_col, vec_col)
    return cosine_topk(embeddings.join(cand.select(id_col), id_col),
                       query_vec, k, id_col, vec_col)


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (cos >= τ) via LSH candidates + exact verify."""
    dim = int(embeddings.select(F.size(vec_col)).first()[0])
    sigs = lsh_signatures(embeddings, dim, n_planes, seed, id_col, vec_col)
    bits_per_band = n_planes // n_bands
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    (F.shiftright(F.col("sig"), b * bits_per_band)
                     % (1 << bits_per_band)).alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("x"),
    ).select(id_col, "x.band", "x.key")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "key")
    cand = a.join(b, ["band", "key"]).filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    ).distinct()
    ea = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    eb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-bounded ANN re-rank path
# ---------------------------------------------------------------------------

def pq_codebooks(
    embeddings: DataFrame,
    m: int = 16,
    ksub: int = 64,
    sample: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks -> (m, ksub, dim/m) array (Jégou et al., TPAMI
    2011): split each (unit-normalized) vector into m subvectors and
    k-means each subspace independently.

    At 100 TB the point of PQ is MEMORY: a vector becomes m uint8 codes
    (m bytes) instead of dim floats — the candidate-generation structure
    fits where raw vectors cannot. Training mirrors ``ivf_centroids``:
    deterministic bounded sample in md5(id) hash order (unbiased w.r.t.
    id assignment, see ``_train_sample``), first-rows init, lowest-index
    tie-break, empty clusters keep their previous centroid."""
    rows = _train_sample(embeddings, sample, id_col, vec_col)
    x = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        s = x[:, j * dsub:(j + 1) * dsub]
        cent = s[:ksub].copy()
        for _ in range(iters):
            d2 = ((s[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin ties -> lowest index
            for c in range(ksub):
                members = s[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes:array<int>): nearest sub-centroid per subspace. One
    Arrow pass, one (n, dsub) x (dsub, ksub) matmul per subspace per
    batch against the closure-broadcast codebooks — O(1) plan size in dim
    (the lsh_signatures lesson)."""
    m, ksub, dsub = codebooks.shape
    cb = np.ascontiguousarray(codebooks)
    half_norms = 0.5 * (cb ** 2).sum(axis=2)  # (m, ksub)
    schema = T.StructType([
        embeddings.schema[id_col],
        T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
    ])

    def _encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(v), m), dtype=np.int32)
            for j in range(m):
                s = v[:, j * dsub:(j + 1) * dsub]
                # argmin ||s - c||^2 == argmax (s.c - ||c||^2/2)
                codes[:, j] = (s @ cb[j].T - half_norms[j]).argmax(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "codes": list(codes)})

    return embeddings.select(id_col, vec_col).mapInPandas(_encode, schema)


#: pq_topk's corpus-relative candidate default: re-rank max(this floor,
#: PQ_NCAND_FRAC of the corpus). At 1% the exact re-rank stays a rounding
#: error of the ADC scan's cost while covering the quantization error far
#: past the sf1 recall knee (see BENCH pq_recall_curve).
PQ_NCAND_MIN = 100
PQ_NCAND_FRAC = 0.01


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int | None = None,
    m: int = 16,
    ksub: int = 64,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC candidate generation + exact cosine re-rank -> (id, cos).

    The ADC (asymmetric distance computation) pass touches ONLY the codes
    table: the query is folded into an (m, ksub) lookup table driver-side
    and each row's approximate similarity is m JVM array lookups — the
    literal table is m*ksub doubles (64 here), bounded and independent of
    dim, not the per-dim literal bloat the round-1 ANN died of. The top
    ``n_candidates`` by ADC are then re-ranked EXACTLY against their raw
    vectors, so with a candidate margin that covers the quantization error
    the output equals brute force — which is what the driver gate checks;
    recall/compression honesty is pinned in pytest. Pass persisted
    ``codes`` (+ ``codebooks``) to amortize the index across queries.

    ``n_candidates`` defaults CORPUS-RELATIVE: max(PQ_NCAND_MIN,
    PQ_NCAND_FRAC * corpus rows) — a fixed absolute margin silently
    degrades recall as the corpus grows (sf1 measured recall@10 at a
    flat ncand=100 is 0.833; at 1% it is 1.0). The sizing count scans
    only the m-byte codes table; pass an explicit n_candidates to skip
    it on a latency-critical path."""
    if codebooks is None:
        codebooks = pq_codebooks(embeddings, m, ksub, sample,
                                 id_col=id_col, vec_col=vec_col)
    m, ksub, dsub = codebooks.shape
    idx = codes if codes is not None else pq_encode(
        embeddings, codebooks, id_col, vec_col)
    if n_candidates is None:
        n_candidates = max(PQ_NCAND_MIN,
                           int(math.ceil(PQ_NCAND_FRAC * idx.count())))

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    # table[j, c] = q_sub_j . codebook[j, c]  (unit vectors: ADC ~ cosine)
    table = np.einsum("jd,jcd->jc", q.reshape(m, dsub), codebooks)
    tbl = F.array(*[
        F.array(*[F.lit(float(v)) for v in row]) for row in table
    ])
    adc = F.aggregate(
        F.sequence(F.lit(1), F.lit(m)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.element_at(tbl, i),
                       F.element_at(F.col("codes"), i) + 1),
    )
    cand = (
        idx.select(id_col, adc.alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(n_candidates)
        .select(id_col)
    )
    ev = embeddings.select(id_col, vec_col).join(F.broadcast(cand), id_col)
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    ev = ev.withColumn("_q", qlit)
    cos = _dot(vec_col, "_q") / (_norm(vec_col) * _norm("_q"))
    return (
        ev.select(F.col(id_col), F.round(cos, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    pool: int = 30,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple = (),
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k -> (rank, id, rel).

    Two phases with very different scales, split accordingly:

    1. RELEVANCE (distributed): exact cosine vs the query over the whole
       corpus (JVM zip_with/aggregate, column-pruned scan), keep the top
       ``pool`` candidates (TakeOrderedAndProject bounded heap). At
       100 TB this phase is ann_topk/ivf_topk instead — same contract
       (a small candidate pool), cheaper scan.
    2. GREEDY MMR (driver): the O(pool^2) selection over the pool-row
       candidate set — pool is k-scale (30), so this is a k-row driver
       fusion like hybrid RRF, NOT a collect of corpus data. Each step
       picks argmax of lam*rel - (1-lam)*max_sim_to_selected.

    Float discipline: rel and pairwise sims round to 5dp (embedding
    cosine discipline — 6th-decimal summation-order flips), the MMR
    objective re-rounds to 5dp, ties break id asc; pairwise dot products
    use sequential left-to-right summation to match the SQL oracle's
    list_sum exactly.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = embeddings.withColumn("_q", q)
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin([int(i) for i in exclude_ids]))
    cos = _dot(vec_col, "_q") / (_norm(vec_col) * _norm("_q"))
    cands = (
        df.select(F.col(id_col), F.round(cos, 5).alias("rel"), F.col(vec_col))
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(pool)
        .collect()
    )
    ids = [int(r[id_col]) for r in cands]
    rels = {int(r[id_col]): float(r["rel"]) for r in cands}
    vecs = {int(r[id_col]): [float(x) for x in r[vec_col]] for r in cands}

    def _cos(a: list[float], b: list[float]) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return round(dot / ((na ** 0.5) * (nb ** 0.5)), 5)

    sims = {}
    for i in ids:
        for j in ids:
            if i != j:
                sims[(i, j)] = _cos(vecs[i], vecs[j])

    selected: list[int] = []
    remaining = list(ids)  # already (rel desc, id asc) ordered
    out = []
    while remaining and len(selected) < k:
        if not selected:
            pick = remaining[0]
        else:
            # argmax of rounded MMR, tie-break id asc (remaining is id-
            # unsorted after pops, so compare explicitly)
            best_key, pick = None, None
            for cand in remaining:
                max_sim = max(sims[(cand, s)] for s in selected)
                mmr = round(lam * rels[cand] - (1.0 - lam) * max_sim, 5)
                key = (mmr, -cand)
                if best_key is None or key > best_key:
                    best_key, pick = key, cand
        selected.append(pick)
        remaining.remove(pick)
        out.append((len(selected), pick, rels[pick]))

    spark = embeddings.sparkSession
    return spark.createDataFrame(
        out, f"rank int, {id_col} long, rel double")
