"""Dedup + similarity operator tests: the round-2 shuffle/plan rewrites.

- MinHash wide layout == pure-Python oracle and == legacy long layout
- LSH candidate pairs identical between wide and long band-key paths
- lsh_signatures: matmul signatures == per-plane sign bits (numpy oracle),
  and the plan stays O(1) in embedding dim (no literal-array blowup)
- cosine_pairs finds planted exact duplicates (non-vacuous by construction)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.hashing import MERSENNE_P, minhash_params
from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators import dedup, similarity

N_PERM = 8

_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy cat again and again"),
    (2, "completely different text about spark shuffles and partitions"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "spark shuffles and partitions require careful skew handling"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _py_shingles(text: str, k: int = dedup.SHINGLE_K) -> set[str]:
    toks = tokenize_py(text)
    return {" ".join(toks[i:i + k]) for i in range(max(len(toks) - k + 1, 0))}


def _py_minhash(text: str, n_perm: int = N_PERM) -> list[int]:
    a, b = minhash_params(n_perm)
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        for s in _py_shingles(text)
    ]
    return [min((a[i] * h + b[i]) % MERSENNE_P for h in hs) for i in range(n_perm)]


def test_minhash_wide_matches_python_oracle(spark, docs_df):
    wide = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(N_PERM)]
        for r in dedup.minhash_signatures_wide(docs_df, n_perm=N_PERM).collect()
    }
    for doc_id, text in _DOCS:
        assert wide[doc_id] == _py_minhash(text), f"doc {doc_id}"


def test_minhash_long_is_unpivot_of_wide(spark, docs_df):
    long_rows = {
        (r["doc_id"], r["perm"]): r["minhash"]
        for r in dedup.minhash_signatures(docs_df, n_perm=N_PERM).collect()
    }
    assert len(long_rows) == len(_DOCS) * N_PERM
    for doc_id, text in _DOCS:
        oracle = _py_minhash(text)
        for i in range(N_PERM):
            assert long_rows[(doc_id, i)] == oracle[i]


def test_lsh_candidates_wide_equals_long(spark, docs_df):
    wide = dedup.minhash_signatures_wide(docs_df, n_perm=N_PERM)
    long_sig = dedup.minhash_signatures(docs_df, n_perm=N_PERM)
    got_wide = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs_wide(wide, n_perm=N_PERM, n_bands=4).collect()
    }
    got_long = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(long_sig, n_bands=4).collect()
    }
    assert got_wide == got_long
    # exact duplicates (0, 3) must collide in every band
    assert (0, 3) in got_wide


def test_minhash_dedup_pairs_end_to_end(spark, docs_df):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_dedup_pairs(
            docs_df, n_perm=N_PERM, n_bands=4, threshold=0.5
        ).collect()
    }
    assert pairs.get((0, 3)) == 1.0  # exact dup survives verify


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def _emb_df(spark, n: int, dim: int, seed: int = 7, dupes: int = 3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(dupes):  # plant exact duplicates (cos == 1.0)
        m[n - 1 - i] = m[i]
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), m


def test_lsh_signatures_match_numpy_oracle(spark):
    df, m = _emb_df(spark, 40, 16)
    got = {r["vec_id"]: r["sig"] for r in
           similarity.lsh_signatures(df, dim=16, n_planes=8).collect()}
    planes = similarity._planes(16, 8, 42)
    dots = m.astype(np.float64) @ planes.T
    want = ((dots > 0).astype(np.int64) @ (1 << np.arange(8))).tolist()
    assert [got[i] for i in range(40)] == want


def test_lsh_signature_plan_bounded_at_high_dim(spark):
    """The signature plan must be O(1) in dim: at dim=256 with 32 planes the
    round-1 literal-array plan would embed 8k+ doubles; the matmul plan is a
    single MapInPandas node and its string stays small."""
    df, _ = _emb_df(spark, 8, 256)
    sigs = similarity.lsh_signatures(df, dim=256, n_planes=32)
    plan = sigs._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" in plan
    assert len(plan) < 5000, f"plan blew up: {len(plan)} chars"
    assert sigs.count() == 8  # and it actually runs


def test_cosine_pairs_finds_planted_duplicates(spark):
    df, _ = _emb_df(spark, 60, 32, dupes=3)
    got = {(r["id_a"], r["id_b"]): r["cos"]
           for r in similarity.cosine_pairs(df, threshold=0.99, n_planes=16,
                                            n_bands=4).collect()}
    for i in range(3):
        assert got.get((i, 59 - i)) == pytest.approx(1.0), (i, 59 - i)


def test_ann_topk_agrees_with_brute_force_on_duplicates(spark):
    df, m = _emb_df(spark, 60, 32, dupes=1)
    q = [float(x) for x in m[0]]
    ann = similarity.ann_topk(df, q, k=3, n_planes=16, n_bands=4).collect()
    # vec 0 and its planted duplicate 59 share every band with the query
    # (identical vectors), so both must surface with cos 1.0
    top_ids = {r["vec_id"] for r in ann}
    assert {0, 59} <= top_ids
    assert all(r["cos"] <= 1.0 for r in ann)
    assert [r["cos"] for r in ann] == sorted((r["cos"] for r in ann), reverse=True)


def test_ann_topk_with_precomputed_index(spark):
    """ann_topk over a persisted (id, sig, vec) signature index returns the
    same rows as the build-on-the-fly path (the amortized production
    query path never rescans the corpus)."""
    from searchengine_spark.operators import similarity

    df, _ = _emb_df(spark, 50, 16)
    q = [float(x) for x in df.select("embedding").first()["embedding"]]
    sigs = similarity.lsh_signatures(
        df, dim=len(q), n_planes=16, seed=7, keep_vec=True).cache()
    fresh = similarity.ann_topk(df, q, k=5, n_planes=16, n_bands=4,
                                seed=7).collect()
    indexed = similarity.ann_topk(df, q, k=5, n_planes=16, n_bands=4,
                                  seed=7, signatures=sigs).collect()
    assert [tuple(r) for r in fresh] == [tuple(r) for r in indexed]


def _py_simhash32(text: str) -> int | None:
    """Independent pure-python SimHash oracle (reference for both impls)."""
    from collections import Counter

    counts = Counter(tokenize_py(text))
    if not counts:
        return None
    s = [0] * 32
    for w, tf in counts.items():
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        for b in range(32):
            s[b] += tf * (2 * ((h >> b) & 1) - 1)
    return sum((1 << b) for b in range(32) if s[b] > 0)


def test_simhash_map_equals_agg_and_python(spark, docs_df):
    """The zero-shuffle Arrow-map simhash32 must agree bit-for-bit with the
    explode/groupBy cross-check impl AND the pure-python oracle; docs with
    no admitted tokens are absent from both."""
    extra = spark.createDataFrame(
        [(100, "1234 5678 ... !!!"), (101, None), (102, "café émigré")],
        "doc_id long, text string",
    )
    docs = docs_df.unionByName(extra)
    got_map = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(docs).collect()}
    got_agg = {r["doc_id"]: r["simhash"] for r in dedup.simhash32_agg(docs).collect()}
    assert got_map == got_agg
    assert set(got_map) == {i for i, t in _DOCS}  # no-token docs dropped
    for doc_id, text in _DOCS:
        assert got_map[doc_id] == _py_simhash32(text), doc_id


def test_simhash32_plan_has_no_shuffle(spark, docs_df):
    """SimHash is row-local: the map impl's physical plan must contain no
    Exchange (the 32x explode/groupBy path had two)."""
    plan = dedup.simhash32(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# -- IVF ANN ------------------------------------------------------------------

def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == n_centroids must be EXACTLY brute-force cosine top-k (the
    contract the driver oracle checks)."""
    df, m = _emb_df(spark, 80, 24)
    q = [float(x) for x in m[5]]
    ivf = similarity.ivf_topk(df, q, k=7, n_centroids=8, nprobe=8).collect()
    brute = similarity.cosine_topk(df, q, k=7).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in brute]


def test_ivf_recall_finds_planted_duplicate_at_nprobe_1(spark):
    """An exact duplicate of the query assigns to the query's own nearest
    list, so nprobe=1 must already surface it with cos 1.0."""
    df, m = _emb_df(spark, 60, 16, dupes=1)  # vec 59 == vec 0
    q = [float(x) for x in m[0]]
    got = similarity.ivf_topk(df, q, k=3, n_centroids=8, nprobe=1).collect()
    ids = {r["vec_id"] for r in got}
    assert {0, 59} <= ids
    assert all(r["cos"] <= 1.0 for r in got)


def test_ivf_assign_total_and_deterministic(spark):
    """Every vector lands in exactly one list; training + assignment are
    bit-deterministic across rebuilds (resume/rerun safety)."""
    df, _ = _emb_df(spark, 50, 16)
    cent1 = similarity.ivf_centroids(df, n_centroids=8, sample=32)
    cent2 = similarity.ivf_centroids(df, n_centroids=8, sample=32)
    assert np.array_equal(cent1, cent2)
    a1 = {r["vec_id"]: r["list_id"]
          for r in similarity.ivf_assign(df, cent1, keep_vec=False).collect()}
    a2 = {r["vec_id"]: r["list_id"]
          for r in similarity.ivf_assign(df, cent2, keep_vec=False).collect()}
    assert a1 == a2 and len(a1) == 50
    assert set(a1.values()) <= set(range(8))


def test_ivf_topk_with_precomputed_index(spark):
    """ivf_topk over a persisted (id, list_id, vec) index table returns the
    same rows as build-on-the-fly (the amortized production path)."""
    df, m = _emb_df(spark, 50, 16)
    q = [float(x) for x in m[3]]
    cent = similarity.ivf_centroids(df, n_centroids=8, sample=32)
    idx = similarity.ivf_assign(df, cent).cache()
    fresh = similarity.ivf_topk(df, q, k=5, n_centroids=8, nprobe=3,
                                sample=32).collect()
    amortized = similarity.ivf_topk(df, q, k=5, n_centroids=8, nprobe=3,
                                    index=idx, centroids=cent).collect()
    assert [tuple(r) for r in fresh] == [tuple(r) for r in amortized]


def test_connected_components_chain_and_star(spark):
    # chain 1-2-3-4 (diameter 3), star 10-(11,12,13), isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "id_a long, id_b long",
    )
    from searchengine_spark.operators.dedup import connected_components

    got = {r.doc_id: r.component
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_connected_components_merging_clusters(spark):
    # two chains joined by a late edge: min label must flow across
    pairs = spark.createDataFrame(
        [(5, 6), (7, 8), (6, 7), (100, 8)], "id_a long, id_b long"
    )
    from searchengine_spark.operators.dedup import connected_components

    got = {r.doc_id: r.component
           for r in connected_components(pairs).collect()}
    assert set(got.values()) == {5}
    assert set(got) == {5, 6, 7, 8, 100}


def test_pq_encode_numpy_oracle_and_determinism(spark):
    """Codes match the pure-numpy ADC assignment; training is
    bit-deterministic across rebuilds (resume safety); codes are m small
    ints (the 'vector fits in m bytes' memory contract)."""
    df, m = _emb_df(spark, 60, 16)
    books1 = similarity.pq_codebooks(df, m=4, ksub=8, sample=40)
    books2 = similarity.pq_codebooks(df, m=4, ksub=8, sample=40)
    assert np.array_equal(books1, books2)
    got = {r["vec_id"]: list(r["codes"]) for r in
           similarity.pq_encode(df, books1).collect()}
    x = m.astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    for i in range(60):
        want = [int(((x[i, j * 4:(j + 1) * 4] - books1[j]) ** 2)
                    .sum(axis=1).argmin()) for j in range(4)]
        assert got[i] == want, i
    assert all(0 <= c < 8 for codes in got.values() for c in codes)


def test_pq_topk_planted_duplicate_and_exact_rerank(spark):
    """An exact duplicate quantizes to the query's own codes (maximal
    ADC), so it must surface; the re-rank stage is exact, so returned
    cosines equal brute-force cosines for the same ids."""
    df, m = _emb_df(spark, 60, 16, dupes=1)  # vec 59 == vec 0
    q = [float(x) for x in m[0]]
    got = similarity.pq_topk(df, q, k=5, n_candidates=20, m=4, ksub=8,
                             sample=60).collect()
    ids = {r["vec_id"] for r in got}
    assert {0, 59} <= ids
    brute = {r["vec_id"]: r["cos"]
             for r in similarity.cosine_topk(df, q, k=60).collect()}
    for r in got:
        assert r["cos"] == brute[r["vec_id"]]


def test_pq_topk_default_config_matches_brute_force_on_driver_corpus(spark):
    """The driver-gate contract: at the sf0.01 embeddings (dim 64) the
    default (m=8, ksub=32, 50 candidates) is rank-identical to exact
    cosine top-10 — asserted here so a config drift fails fast in pytest,
    not in the correctness gate."""
    import os

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        import pytest as _pytest
        _pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    pq = [tuple(r) for r in similarity.pq_topk(emb, q, k=10).collect()]
    brute = [tuple(r) for r in similarity.cosine_topk(emb, q, k=10).collect()]
    assert pq == brute


def test_ngram_jaccard_boilerplate_cap(spark):
    """A single boilerplate phrase shared by every doc makes an m^2
    shingle bucket on a raw corpus; max_shingle_df drops it from BOTH the
    join and the per-doc set sizes, so only genuine near-dups pair up."""
    import string

    from searchengine_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved by the foo corporation"
    rows = []
    for i in range(40):
        a, b = string.ascii_lowercase[i // 26], string.ascii_lowercase[i % 26]
        uniq = f"zq{a}{b}x wq{a}{b}y vq{a}{b}z rq{a}{b}w"
        rows.append((i, f"{boiler} {uniq}"))
    # plant one genuine near-dup pair: same unique tail as doc 0
    rows.append((40, rows[0][1] + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # uncapped: the boilerplate bucket pairs every doc with every other
    uncapped = ngram_jaccard_pairs(docs, threshold=0.01).count()
    assert uncapped >= 41 * 40 / 2  # full blow-up: all C(41,2) pairs

    # capped: boilerplate shingles (df=41 > 5) leave the join; only the
    # planted pair shares non-boilerplate shingles
    capped = ngram_jaccard_pairs(docs, threshold=0.01,
                                 max_shingle_df=5).collect()
    assert [(int(r.id_a), int(r.id_b)) for r in capped] == [(0, 40)]
    # and its jaccard is over the NON-boilerplate sets only
    assert 0 < capped[0].jaccard <= 1.0


def test_connected_components_path_graph_budget_alarm(spark):
    """Worst-case dup chain: a path graph needs diameter rounds. Blowing
    the iteration budget must degrade loudly (raise by default / warn on
    request with monotone partial labels), never return wrong clusters
    silently."""
    import warnings

    from searchengine_spark.operators.dedup import connected_components

    n = 12  # path 0-1-2-...-11, diameter 11
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=3)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        partial = connected_components(pairs, max_iters=3,
                                       on_budget="warn").collect()
    assert any("did not converge" in str(w.message) for w in caught)
    # partial labels are monotone upper phases: each node's label is a
    # node id on its path toward 0, never an unrelated component
    assert all(0 <= int(r.component) <= int(r.doc_id) for r in partial)

    done = connected_components(pairs, max_iters=n + 2).collect()
    assert {int(r.component) for r in done} == {0}
    assert len(done) == n

    with pytest.raises(ValueError, match="on_budget"):
        connected_components(pairs, on_budget="explode")


def test_alternating_cc_log_rounds_on_long_chain(spark):
    """The large-star/small-star twin converges on a diameter-119 path
    graph in O(log n) rounds — far inside a budget that label
    propagation (diameter rounds) must blow — and labels every node with
    the chain minimum. The verdict-#8 insurance path for
    web-graph-shaped dup inputs (sliding-window crawls)."""
    from searchengine_spark.operators.dedup import (
        connected_components,
        connected_components_alternating,
    )

    n = 120  # diameter 119: propagation needs ~119 sweeps
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")

    got = {r.doc_id: r.component
           for r in connected_components_alternating(
               pairs, max_rounds=14).collect()}  # ~2*log2(120) + slack
    assert got == {i: 0 for i in range(n)}

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=5)


def test_alternating_cc_agrees_with_propagation(spark):
    """Exact agreement with min-label propagation on a mixed fixture:
    chains, a star, a merged cluster, an isolated pair, and a self-pair
    (which must still label as itself)."""
    from searchengine_spark.operators.dedup import (
        connected_components,
        connected_components_alternating,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13),
         (20, 21), (5, 6), (7, 8), (6, 7), (100, 8), (42, 42)],
        "id_a long, id_b long",
    )
    prop = {r.doc_id: r.component
            for r in connected_components(pairs).collect()}
    alt = {r.doc_id: r.component
           for r in connected_components_alternating(pairs).collect()}
    assert alt == prop
    assert alt[42] == 42


def test_cc_on_budget_alternate_falls_back(spark):
    """on_budget='alternate': exhausting the propagation budget hands
    the input to the alternating method and returns CORRECT labels (the
    other two modes raise / return partials)."""
    from searchengine_spark.operators.dedup import connected_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    got = {r.doc_id: r.component
           for r in connected_components(
               pairs, max_iters=3, on_budget="alternate").collect()}
    assert got == {i: 0 for i in range(n)}


def test_pq_default_ncand_recall_at_sf1_scale(spark):
    """The corpus-relative default candidate count (max(100, 1% of n))
    holds recall@10 >= 0.95 at the sf1 ANN geometry (20k clustered
    vectors, dim 64 — the bench's ann_scale corpus): pins the round-4
    finding that a FIXED ncand=100 silently degrades to 0.833 at this
    scale while the corpus-relative default does not. The full
    recall-vs-ncand curve is published per-round in the bench sidecar
    (pq_recall_curve_sf1)."""
    rng = np.random.default_rng(7)
    n, dim, n_clusters = 20_000, 64, 200
    centers = rng.normal(size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n)
    X = (centers[assign] + 0.15 * rng.normal(size=(n, dim))).astype(
        np.float32)
    emb = spark.createDataFrame(
        ((int(i), [float(v) for v in X[i]]) for i in range(n)),
        "vec_id long, embedding array<float>",
    ).repartition(8).persist()
    emb.count()

    Xn = X.astype(np.float64)
    Xn /= np.maximum(np.linalg.norm(Xn, axis=1, keepdims=True), 1e-12)
    books = similarity.pq_codebooks(emb)
    codes = similarity.pq_encode(emb, books).persist()
    codes.count()
    try:
        hits = 0
        probes = [int(p) for p in rng.integers(0, n, size=2)]
        for p in probes:
            cos = Xn @ Xn[p]
            order = np.lexsort((np.arange(n), -np.round(cos, 6)))
            exact = {int(i) for i in order[:10]}
            got = {int(r["vec_id"]) for r in similarity.pq_topk(
                emb, [float(v) for v in X[p]], k=10,
                codes=codes, codebooks=books).collect()}
            hits += len(got & exact)
        assert hits / (10 * len(probes)) >= 0.95
    finally:
        codes.unpersist()
        emb.unpersist()
