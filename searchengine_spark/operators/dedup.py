"""Deduplication operators for large-scale training-data pipelines.

All JVM-side column arithmetic (no Python UDF in any hot path):

- exact           : hash-groupBy on md5(text)
- n-gram Jaccard  : word-shingle inverted join (exact pairwise similarity,
                    bounded by shared shingles — the verification path)
- MinHash + LSH   : (a*h32(shingle)+b) mod P signatures -> banded bucket
                    join (the 100 TB scale path; candidate pairs only touch
                    docs that collide in >=1 band)
- SimHash (32-bit): per-bit weighted majority of term-hash bits; near-dup
                    iff hamming distance <= threshold

Scale notes: shingle/band joins are shuffles on short strings; LSH keeps the
candidate set near-linear. The pairwise Jaccard join is only run on LSH
candidates at scale (``jaccard_of_candidates``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from searchengine_spark.functions.hashing import (
    MERSENNE_P,
    h32_col,
    minhash_params,
)
from searchengine_spark.functions.tokenize import tokenize_udf

SHINGLE_K = 3


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("tokens", tokenize_udf(F.col(text_col)))


def shingles_expr(tokens_col: str = "tokens", k: int = SHINGLE_K) -> F.Column:
    """Word k-gram shingles as array<string> (JVM-side, no UDF).

    Docs shorter than ``k`` tokens yield an EMPTY array: the size guard is
    load-bearing because Spark's ``sequence(1, 0)`` is the *descending*
    [1, 0], which would drive ``element_at`` out of range."""
    t = tokens_col
    parts = ", ".join(f"element_at({t}, i + {j})" for j in range(k))
    return F.expr(
        f"CASE WHEN size({t}) >= {k} THEN "
        f"transform(sequence(1, size({t}) - {k - 1}), i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def doc_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """docs(id, text) -> distinct (id, shingle).

    ``max_shingle_df`` drops boilerplate shingles appearing in more than
    that many docs (same guard as decontam.cross_split_contamination): a
    shingle shared by m docs makes an m^2 bucket in any shingle join, so
    on a raw corpus a single boilerplate phrase (license header, nav
    text) otherwise quadratically blows up the pair space."""
    sh = (
        with_tokens(docs)
        .select(id_col, F.explode(shingles_expr(k=k)).alias("shingle"))
        .distinct()
    )
    if max_shingle_df is not None:
        common = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(common, "shingle", "left_anti")
    return sh


# -- exact ------------------------------------------------------------------

def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (text_md5, n_dups, keep_id): one row per distinct text, keeper =
    min id. Filter n_dups > 1 for the duplicate report."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.count("*").alias("n_dups"),
        F.min(id_col).alias("keep_id"),
    )


# -- exact pairwise n-gram Jaccard -------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for pairs with Jaccard(shingle sets) >= τ.

    Inverted-index join: pairs only materialize for docs sharing a shingle.
    At 100 TB this runs on LSH candidates, not the full corpus — and with
    ``max_shingle_df`` set, boilerplate shingles (df > cap) are excluded
    from BOTH the join and the per-doc set sizes, so Jaccard is computed
    over the non-boilerplate shingle sets and the worst-case bucket is
    capped at max_shingle_df^2 instead of (docs sharing one phrase)^2.
    """
    sh = doc_shingles(docs, id_col, k, max_shingle_df=max_shingle_df).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- MinHash + LSH ------------------------------------------------------------

def minhash_signatures_wide(
    docs: DataFrame,
    n_perm: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
) -> DataFrame:
    """-> (id, mh_0 .. mh_{n_perm-1}): one row per doc.

    ONE shuffle of plain (id, h) rows: the n_perm affine hashes are
    computed as columns of the SAME row and aggregated by a single
    groupBy(id) with n_perm min() aggregates — no n_perm-fold row
    amplification through the exchange (round-1 rewrite: the previous
    perm-exploded encoding pushed n_perm x |shingles| rows into the
    partial agg and dominated the bench at 51 s/sf0.1).
    """
    a, b = minhash_params(n_perm, seed)
    sh = doc_shingles(docs, id_col, k).withColumn("h", h32_col(F.col("shingle")))
    aggs = [
        F.min(
            (F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(MERSENNE_P)
        ).alias(f"mh_{i}")
        for i in range(n_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures_inrow(
    docs: DataFrame,
    n_perm: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """ZERO-shuffle minhash: (id, mh_0..mh_{n_perm-1}) computed entirely
    in-row (shingles -> h32 per shingle -> per-perm array_min), no explode
    and no aggregation. Row-identical to ``minhash_signatures_wide``
    (asserted in tests) — and, being stateless, it is the variant a
    STREAMING pipeline can apply before its stateful LSH stage.
    Docs with no shingles (< k tokens) are dropped, matching the wide
    variant's explode semantics. ``keep_cols`` are passed through (e.g.
    the event-time column a stream needs downstream)."""
    a, b = minhash_params(n_perm, seed)
    d = (
        with_tokens(docs)
        .withColumn("_sh", shingles_expr("tokens", k))
        .where(F.size("_sh") > 0)
        .withColumn("_h", F.transform(F.col("_sh"), lambda s: h32_col(s)))
    )
    mh = [
        F.array_min(
            F.transform(
                F.col("_h"),
                lambda x: (F.lit(a[i]) * x + F.lit(b[i])) % F.lit(MERSENNE_P),
            )
        ).alias(f"mh_{i}")
        for i in range(n_perm)
    ]
    return d.select(id_col, *keep_cols, *mh)


def band_keys_expr(n_perm: int, n_bands: int) -> F.Column:
    """array<struct<band:int, band_key:string>> projected off a wide
    (mh_0..mh_{n_perm-1}) row: md5 of the comma-joined minhashes of each
    band, in perm order — the single definition both the batch bucket
    join and the streaming stateful stage key on."""
    rows_per_band = n_perm // n_bands
    return F.array(*[
        F.struct(
            F.lit(bnd).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{bnd * rows_per_band + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            ).alias("band_key"),
        )
        for bnd in range(n_bands)
    ])


def minhash_signatures(
    docs: DataFrame,
    n_perm: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
) -> DataFrame:
    """-> (id, perm, minhash): n_perm rows per doc (long format).

    Thin unpivot over the wide layout: stack() is a projection, so the
    long format costs no extra shuffle.
    """
    wide = minhash_signatures_wide(docs, n_perm, seed, id_col, k)
    pairs = ", ".join(f"{i}, mh_{i}" for i in range(n_perm))
    return wide.selectExpr(
        id_col, f"stack({n_perm}, {pairs}) AS (perm, minhash)"
    )


def lsh_candidate_pairs_wide(
    wide: DataFrame,
    n_perm: int,
    n_bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, mh_*) -> candidate (id_a, id_b) sharing >=1 LSH band.

    Band keys are md5 of the comma-joined minhashes in perm order,
    projected straight off the wide row (no second aggregation, no
    driver collect); bucket join on (band, band_key).
    """
    bands = wide.select(
        id_col, F.explode(band_keys_expr(n_perm, n_bands)).alias("x")
    ).select(id_col, "x.band", "x.band_key")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 4,
    id_col: str = "doc_id",
    n_perm: int | None = None,
) -> DataFrame:
    """Long-format (id, perm, minhash) variant; pass ``n_perm`` explicitly
    to skip the max(perm) derivation job."""
    if n_perm is None:
        n_perm_row = signatures.agg(F.max("perm").alias("m")).collect()[0]["m"]
        n_perm = int(n_perm_row) + 1
    rows_per_band = n_perm // n_bands
    bands = (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list(F.struct("perm", "minhash"))).minhash)
            ).alias("band_key")
        )
    )
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    n_perm: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale path: LSH candidates -> exact Jaccard verify -> pairs >= τ."""
    wide = minhash_signatures_wide(docs, n_perm=n_perm, id_col=id_col)
    cands = lsh_candidate_pairs_wide(wide, n_perm=n_perm, n_bands=n_bands, id_col=id_col)
    sh = doc_shingles(docs, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        cands.join(sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- SimHash ------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash32_udf(texts: pd.Series) -> pd.Series:
    """text -> 32-bit SimHash (null if the doc admits no tokens).

    One Arrow batch in, one numpy accumulation per doc: tokenize, h32 each
    distinct term (memoized across the batch — term sets repeat heavily),
    weighted per-bit majority. Identical semantics to ``simhash32_agg``
    (asserted by test_simhash_map_equals_agg)."""
    import numpy as np
    import pandas as pd

    from searchengine_spark.functions.hashing import h32_py
    from searchengine_spark.functions.tokenize import term_counts_py

    cache: dict[str, int] = {}
    bitpos = np.arange(32, dtype=np.uint32)
    bitval = np.uint64(1) << bitpos.astype(np.uint64)
    out = []
    for t in texts:
        counts = term_counts_py(t)
        if not counts:
            out.append(None)
            continue
        hs = np.empty(len(counts), dtype=np.uint32)
        tfs = np.empty(len(counts), dtype=np.int64)
        for j, (w, c) in enumerate(counts.items()):
            h = cache.get(w)
            if h is None:
                h = cache[w] = h32_py(w)
            hs[j] = h
            tfs[j] = c
        bits = ((hs[:, None] >> bitpos) & np.uint32(1)).astype(np.int64)
        s = (tfs[:, None] * (2 * bits - 1)).sum(axis=0)
        out.append(int(((s > 0) * bitval).sum()))
    return pd.Series(out, dtype="object")


def simhash32(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """-> (id, simhash:long): 32-bit SimHash over term h32 hashes weighted
    by tf. Bit b set iff sum over terms of tf * (2*bit_b(h)-1) > 0.

    SimHash is row-local (a pure function of one doc's term counts), so
    this is a ZERO-shuffle map — one Arrow pass over text. Docs admitting
    no tokens are dropped (parity with the agg/oracle path, which never
    emits a row for them)."""
    return docs.select(
        id_col, _simhash32_udf(F.col(text_col)).alias("simhash")
    ).filter(F.col("simhash").isNotNull())


def simhash32_agg(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Shuffle-based cross-check path for :func:`simhash32` (the map
    implementation is the hot path — this one 32x-explodes (term, tf) rows
    into a groupBy(id, bit) and exists to pin the semantics from a second,
    independent direction).

    Pure column arithmetic: explode (term, tf), cross with 32 bit positions
    via an inline array, hash-agg per (id, bit), then bit-OR reassembly.
    """
    from searchengine_spark.functions.tokenize import term_counts_udf

    tf = docs.select(
        id_col, F.explode(term_counts_udf(F.col("text"))).alias("p")
    ).select(id_col, F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
    tf = tf.withColumn("h", h32_col(F.col("term")))
    bits = tf.select(
        id_col,
        "tf",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("bit"),
                    (F.shiftright(F.col("h"), b) % 2).alias("is_set"),
                )
                for b in range(32)
            ])
        ).alias("x"),
    ).select(
        id_col,
        F.col("x.bit").alias("bit"),
        (F.col("tf") * (F.col("x.is_set") * 2 - 1)).alias("w"),
    )
    per_bit = bits.groupBy(id_col, "bit").agg(F.sum("w").alias("s"))
    bit_value = F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
    return per_bit.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, bit_value).otherwise(0)).alias("simhash")
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Scale path: block on 4 byte-bands of the hash (any match => candidate),
    then exact popcount verify — avoids the full cross join.
    """
    sh = simhash32(docs, id_col)
    bands = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"),
                         (F.shiftright(F.col("simhash"), i * 8) % 256).alias("key"))
                for i in range(4)
            ])
        ).alias("b"),
    ).select(id_col, "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key")
    b = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# -- duplicate-cluster assignment ---------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    on_budget: str = "raise",
) -> DataFrame:
    """(doc_id, component) for every doc appearing in ``pairs``;
    component = min doc_id reachable through the pair graph. The last
    dedup stage: pair lists (Jaccard / MinHash / SimHash / embedding)
    become keep-one decisions (keep doc_id == component).

    Min-label propagation: each round every node takes the min of its own
    and its neighbours' labels (one shuffle per round); converges in
    graph-diameter rounds. Near-dup clusters are shallow (duplicates of a
    common source), so the diameter is tiny in practice — the O(log n)
    large-star/small-star variant is only worth its complexity on
    web-graph-shaped inputs. ``localCheckpoint`` caps lineage growth so
    the plan does not deepen with each round; the convergence probe is a
    count on the CHANGED set only (empty at fixpoint).

    Iteration-budget alarm: the diameter bound is an ASSUMPTION, and a
    pathological dup chain (a path graph — e.g. a sliding-window crawl
    where each page near-dups only its neighbors) needs diameter rounds.
    Exhausting ``max_iters`` without convergence therefore degrades
    LOUDLY: ``on_budget="raise"`` (default) raises RuntimeError — wrong
    cluster labels must never flow silently into keep/drop decisions —
    while ``on_budget="warn"`` emits a warning and returns the partial
    labels (every returned component is a superset-split of the true
    one: labels only ever decrease toward the true minimum).
    """
    if on_budget not in ("raise", "warn", "alternate"):
        raise ValueError(
            f"on_budget must be 'raise', 'warn' or 'alternate', got {on_budget!r}")
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select("src").distinct()
        .withColumn("label", F.col("src"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        nbr = (
            edges.join(labels.withColumnRenamed("src", "dst"), "dst")
            .select("src", "label")
        )
        new = (
            nbr.union(labels)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "src")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        msg = (f"connected_components did not converge within "
               f"max_iters={max_iters}: the dup graph's diameter exceeds "
               f"the budget (path-graph-shaped chain?). Raise max_iters "
               f"or switch to a log-diameter method for this input.")
        if on_budget == "raise":
            raise RuntimeError(msg)
        if on_budget == "alternate":
            # the log-diameter insurance path: restart with
            # large-star/small-star, which converges in O(log n) rounds
            # regardless of diameter — correct labels always beat the
            # partial budget-exhausted ones
            return connected_components_alternating(pairs, id_a, id_b)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(F.col("src").alias("doc_id"),
                         F.col("label").alias("component"))


def connected_components_alternating(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 40,
) -> DataFrame:
    """(doc_id, component) via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the log-diameter twin of ``connected_components`` for web-graph-
    shaped inputs where min-label propagation's diameter-rounds bound is
    the bottleneck (a sliding-window crawl whose pages near-dup only
    their neighbors is a path graph: diameter == chain length).

    Each round rewires the edge set toward stars rooted at component
    minima, halving long chains, so a diameter-10^6 chain converges in
    ~20 rounds instead of 10^6 label sweeps:

    - large-star: every node links its LARGER neighbors to the minimum
      of its closed neighborhood (strictly decreases large-side depth;
      never creates an edge whose small side isn't a local minimum).
    - small-star: every node links its smaller-or-equal neighbors (and
      itself) to that minimum, collapsing two-level trees into stars.

    Both steps are one groupBy each (min over the neighborhood rides the
    shuffle as a partial agg) plus one broadcast-free join keyed on the
    grouping column; per-round ``localCheckpoint`` caps lineage exactly
    like the label-propagation path. Fixpoint = edge set unchanged
    (child->parent rows compared exactly via two anti-joins on the
    CHANGED probe, not a hash). At fixpoint every component is a star
    centered on its minimum id, so the star edges ARE the labels.

    ``max_rounds=40`` covers components of ~2^40 nodes; exhausting it
    still raises (same never-silent contract as the propagation path).
    """
    # any orderable id type works (min/greatest/least are type-generic),
    # matching connected_components' contract
    raw = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    # canonical child->parent orientation (u > v), deduped; self-pairs
    # carry no connectivity but their node must still label as itself
    # (same contract as connected_components)
    edges = (
        raw.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    members = (
        raw.select(F.col("u").alias("doc_id"))
        .union(raw.select(F.col("v").alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("mv", F.col("u")).alias("m"))
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # already child->parent oriented (u > v) by construction
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        relink = (
            e.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return relink

    for _ in range(max_rounds):
        new = _small_star(_large_star(edges)).localCheckpoint()
        changed = (
            new.exceptAll(edges).limit(1).count()
            + edges.exceptAll(new).limit(1).count()
        )
        edges = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_alternating did not converge within "
            f"max_rounds={max_rounds} — components larger than 2^{max_rounds}"
            f" nodes, or a non-terminating edge oscillation (file a bug).")

    labels = edges.select(F.col("u").alias("doc_id"),
                          F.col("v").alias("component"))
    # roots (and any node whose star collapsed onto itself) label as self
    return (
        members.join(labels, "doc_id", "left")
        .select("doc_id",
                F.coalesce("component", "doc_id").alias("component"))
    )


def keep_best(
    components: DataFrame,
    scores: DataFrame,
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware cluster canonicalization: given (doc_id, component)
    cluster assignments and per-doc scores, mark each cluster's highest-
    scoring member as the keeper (tie: lowest doc_id) — the refinement of
    keep-first/min-id that a training pipeline actually wants (keep the
    BEST duplicate, not the earliest). One join + one window over the
    (small) clustered-doc set; docs outside any cluster are untouched by
    construction (they are absent from ``components``)."""
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.asc("doc_id"))
    return (
        components.join(scores, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id", "component", (F.col("_rn") == 1).alias("keep"))
    )
