"""Dedup family: exact/minhash/simhash/CC/span dedup + the cleaning recipe.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.functions.hashing import minhash_params
from searchengine_spark.operators import dedup, textstats
from searchengine_spark.entry._shared import (BASE_CTES, _TOKS_TEXT, _docs)
from searchengine_spark.entry.profiling import (_QUALITY_CTE)
from searchengine_spark.entry.text import (SQL_LANG_ID, SQL_QUALITY)


def q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_docs(spark, sf_dir)).select(
        "text_md5",
        F.col("n_dups").cast("long").alias("n_dups"),
        F.col("keep_id").cast("long").alias("keep_id"),
    )


SQL_DEDUP_EXACT = (
    "SELECT md5(text) AS text_md5, count(*)::BIGINT AS n_dups,"
    " min(doc_id)::BIGINT AS keep_id FROM documents GROUP BY 1"
)

_SHINGLE_CTES = f"""
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
       i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingle FROM tokd)
""".strip()

_JACCARD_THRESHOLD = 0.1


def q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=_JACCARD_THRESHOLD)


def q_dedup_components(spark, sf_dir):
    """Duplicate-cluster assignment (operators/dedup.py
    connected_components): min-label propagation over the n-gram-Jaccard
    near-dup pair graph -> (doc_id, component, keep). keep marks the
    cluster canonical (min doc_id) — the doc a dedup pass retains."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                      threshold=_JACCARD_THRESHOLD)
    comp = dedup.connected_components(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


def q_dedup_components_lsls(spark, sf_dir):
    """Same duplicate-cluster assignment computed by the log-diameter
    large-star/small-star algorithm (operators/dedup.py
    connected_components_alternating, Kiveris et al.) — O(log n) rounds
    regardless of graph diameter, the path a web-graph-shaped dup input
    (sliding-window crawl chains) needs. Shares dedup_components'
    DuckDB oracle: both must produce the identical labeling."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                      threshold=_JACCARD_THRESHOLD)
    comp = dedup.connected_components_alternating(pairs)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


SQL_DEDUP_COMPONENTS = f"""WITH RECURSIVE {_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.label
)
SELECT node::BIGINT AS doc_id, min(label)::BIGINT AS component,
       (node = min(label)) AS keep
FROM reach GROUP BY node"""


SQL_NGRAM_JACCARD = f"""WITH {_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}"""

def q_pack_bins(spark, sf_dir, budget: int = 4096):
    """Token-budget packing (operators/packing.py): concatenate-then-cut
    sequence assembly via the two-phase prefix-sum pattern (no global
    sort); the oracle is the equivalent single-window cumsum."""
    from searchengine_spark.operators.packing import pack_bins

    out = pack_bins(_docs(spark, sf_dir), budget=budget, len_col="n_chars")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "start_offset", "bin_id", "offset_in_bin",
    )


SQL_PACK_BINS = """SELECT doc_id,
(sum(n_chars) OVER w - n_chars)::BIGINT AS start_offset,
((sum(n_chars) OVER w - n_chars) // 4096)::BIGINT AS bin_id,
((sum(n_chars) OVER w - n_chars) % 4096)::BIGINT AS offset_in_bin
FROM documents
WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)"""


def q_dedup_keep_first(spark, sf_dir):
    """Batch twin of the in-stream exact dedup
    (streaming/dedup_stream.py): earliest arrival per content hash wins
    (arrival = synthesized doc_id-ordered timestamps here)."""
    import datetime

    from searchengine_spark.streaming.dedup_stream import dedup_keep_first

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "text",
        (F.lit(datetime.datetime(2026, 1, 1))
         + F.make_dt_interval(secs=F.col("doc_id").cast("double")))
        .alias("ts"),
        F.col("doc_id"),
    )
    out = dedup_keep_first(docs)
    return out.select("text_md5",
                      F.col("doc_id").cast("long").alias("keep_doc"))


SQL_DEDUP_KEEP_FIRST = """SELECT md5(text) AS text_md5,
doc_id::BIGINT AS keep_doc
FROM (SELECT doc_id, text,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1"""


def q_split_contamination(spark, sf_dir):
    """Train/eval decontamination (operators/decontam.py): eval-split
    docs sharing 3-gram shingles with any train doc, via the
    shingle-keyed inverted-index join over hash-stable splits."""
    from searchengine_spark.operators.decontam import (
        cross_split_contamination,
    )

    return cross_split_contamination(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"), "split",
        "n_shared_shingles", "n_train_docs",
    )


SQL_SPLIT_CONTAMINATION = f"""WITH {_SHINGLE_CTES},
lab AS (SELECT doc_id,
  CASE WHEN (('0x' || substring(md5(doc_id::VARCHAR || '|split-v1'), 1, 8))::BIGINT % 10000) < 9000 THEN 'train'
       WHEN (('0x' || substring(md5(doc_id::VARCHAR || '|split-v1'), 1, 8))::BIGINT % 10000) < 9500 THEN 'val'
       ELSE 'test' END AS split
  FROM documents),
shl AS (SELECT s.doc_id, s.shingle, l.split FROM sh s JOIN lab l USING (doc_id)),
train AS (SELECT doc_id AS train_doc_id, shingle FROM shl WHERE split = 'train'),
ev AS (SELECT doc_id, split, shingle FROM shl WHERE split IN ('val', 'test'))
SELECT e.doc_id::BIGINT AS doc_id, e.split,
       count(DISTINCT e.shingle)::BIGINT AS n_shared_shingles,
       count(DISTINCT t.train_doc_id)::BIGINT AS n_train_docs
FROM ev e JOIN train t USING (shingle)
GROUP BY 1, 2"""


_N_PERM = 8
_MH_A, _MH_B = minhash_params(_N_PERM)
_MH_P = (1 << 61) - 1
_H32 = "(('0x' || substring(md5(shingle), 1, 8))::BIGINT)"


def q_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir), n_perm=_N_PERM).select(
        "doc_id", "perm", F.col("minhash").cast("long").alias("minhash")
    )


_MH_VALUES = ", ".join(
    f"({i}, {_MH_A[i]}, {_MH_B[i]})" for i in range(_N_PERM)
)

_MH_CTES = f"""{_SHINGLE_CTES},
shh AS (SELECT doc_id, {_H32} AS h FROM sh),
perms(perm, a, b) AS (VALUES {_MH_VALUES}),
mh AS (SELECT doc_id, perm, min((p.a * s.h + p.b) % {_MH_P})::BIGINT AS minhash
       FROM shh s CROSS JOIN perms p GROUP BY 1, 2)"""

SQL_MINHASH_SIGNATURES = f"WITH {_MH_CTES} SELECT doc_id, perm, minhash FROM mh"


def q_lsh_candidates(spark, sf_dir):
    wide = dedup.minhash_signatures_wide(_docs(spark, sf_dir), n_perm=_N_PERM)
    return dedup.lsh_candidate_pairs_wide(wide, n_perm=_N_PERM, n_bands=4).select(
        F.col("id_a").cast("long").alias("id_a"), F.col("id_b").cast("long").alias("id_b")
    )


SQL_LSH_CANDIDATES = f"""WITH {_MH_CTES},
bands AS (SELECT doc_id, (perm // 2) AS band,
                 md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_key
          FROM mh GROUP BY 1, 2)
SELECT DISTINCT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""


def q_minhash_dedup_pairs(spark, sf_dir):
    """End-to-end MinHash dedup SCALE path: LSH band candidates -> exact
    Jaccard verify -> pairs >= τ. This is the pipeline a 100 TB dedup run
    executes (pairwise work bounded by band collisions, never all-pairs);
    the oracle recomputes candidates and the verify join in SQL."""
    return dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir), n_perm=_N_PERM, n_bands=4,
        threshold=_JACCARD_THRESHOLD,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


SQL_MINHASH_DEDUP_PAIRS = f"""WITH {_MH_CTES},
bands AS (SELECT doc_id, (perm // 2) AS band,
                 md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_key
          FROM mh GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*)::BIGINT AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a
              JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}"""


def q_simhash(spark, sf_dir):
    return dedup.simhash32(_docs(spark, sf_dir)).select(
        "doc_id", F.col("simhash").cast("long").alias("simhash")
    )


_SIMHASH_CTES = f"""{BASE_CTES},
tfh AS (SELECT doc_id, tf, (('0x' || substring(md5(term), 1, 8))::BIGINT) AS h FROM tf),
bits AS (SELECT doc_id, bit, sum(tf * (((h >> bit) & 1) * 2 - 1)) AS s
         FROM tfh CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b GROUP BY 1, 2),
sim AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY 1)"""

SQL_SIMHASH = f"WITH {_SIMHASH_CTES} SELECT doc_id, simhash FROM sim"

_MAX_HAMMING = 3


def q_simhash_pairs(spark, sf_dir):
    # band-blocked + verify; lossless vs brute force for hamming<=3 with 4
    # byte-bands (pigeonhole), so the O(n^2) SQL oracle is exact.
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=_MAX_HAMMING).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("int"),
    )


SQL_SIMHASH_PAIRS = f"""WITH {_SIMHASH_CTES}
SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MAX_HAMMING}"""


_SPAN_LEN = 8


def _span_cte(source: str = "documents", suffix: str = "") -> str:
    """DuckDB CTEs ``tokd{suffix}``/``spans{suffix}``: every
    length-_SPAN_LEN token window of every ``source`` doc,
    md5-fingerprinted (span semantics of operators/spans.py)."""
    L = _SPAN_LEN
    return f"""tokd{suffix} AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM {source}),
spans{suffix} AS (
  SELECT doc_id, md5(array_to_string(list_slice(t, i, i + {L - 1}), ' ')) AS span_md5
  FROM tokd{suffix}, unnest(range(1, greatest(len(t) - {L - 1}, 0) + 1)) AS u(i)
)"""


def q_span_dups(spark, sf_dir):
    """ExactSubstr-style duplicated token spans (operators/spans.py):
    in-row window fingerprinting + ONE hash agg — never pairwise."""
    from searchengine_spark.operators.spans import duplicated_spans

    return duplicated_spans(_docs(spark, sf_dir), span_len=_SPAN_LEN)


SQL_SPAN_DUPS = f"""WITH {_span_cte()}
SELECT span_md5, count(DISTINCT doc_id)::BIGINT AS n_docs,
  count(*)::BIGINT AS n_occurrences
FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) > 1"""


def q_span_dup_flags(spark, sf_dir):
    """Per-doc duplicated-span coverage — the substring-granular removal
    signal (docs shorter than the span length carry no windows and are
    absent, matching the SQL GROUP BY)."""
    from searchengine_spark.operators.spans import span_dup_flags

    return span_dup_flags(_docs(spark, sf_dir), span_len=_SPAN_LEN)


SQL_SPAN_DUP_FLAGS = f"""WITH {_span_cte()},
dups AS (SELECT span_md5 FROM spans GROUP BY 1
         HAVING count(DISTINCT doc_id) > 1)
SELECT s.doc_id, count(*)::BIGINT AS n_spans,
  sum(CASE WHEN d.span_md5 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
FROM spans s LEFT JOIN dups d USING (span_md5) GROUP BY 1"""


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware cluster canonicalization (operators/dedup.py
    keep_best): within each near-dup component, keep the HIGHEST-quality
    member (tie: min doc_id) instead of the earliest — the keeper choice
    a training pipeline actually wants."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                      threshold=_JACCARD_THRESHOLD)
    comp = dedup.connected_components(pairs)
    scores = textstats.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "quality")
    out = dedup.keep_best(comp, scores)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        "keep",
    )


SQL_DEDUP_KEEP_BEST = f"""WITH RECURSIVE {_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= {_JACCARD_THRESHOLD}
),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b, id_a FROM prs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.label
),
comp AS (SELECT node AS doc_id, min(label) AS component
         FROM reach GROUP BY node),
{_QUALITY_CTE}
SELECT c.doc_id::BIGINT AS doc_id, c.component::BIGINT AS component,
  (row_number() OVER (PARTITION BY c.component
                      ORDER BY q.quality DESC, c.doc_id ASC) = 1) AS keep
FROM comp c JOIN qbase q USING (doc_id)"""


def q_clean_corpus(spark, sf_dir):
    """End-to-end cleaning recipe — the composition the individual
    operators exist for: exact keep-first dedup -> quality >= 0.75 ->
    lang 'en' -> drop docs with >50% duplicated-span coverage. Span
    coverage is computed over the DEDUPED corpus (order matters: on the
    raw corpus every surviving keep-first winner would be flagged by the
    very duplicate that was just removed). Returns the kept doc_ids (the
    strongest checkable artifact: per-doc membership, not counts). Every
    stage drops rows at sf0.01, so no stage is vacuous. At production
    scale the per-doc text signals are computed as columns of ONE
    tokenizer pass and persisted; here each rides its own operator so
    the gate exercises the real modules."""
    from searchengine_spark.operators.spans import span_dup_flags

    docs = _docs(spark, sf_dir)
    keep_first = docs.groupBy(F.md5("text").alias("_m")).agg(
        F.min("doc_id").alias("doc_id"))
    deduped = docs.join(keep_first.select("doc_id"), "doc_id", "left_semi")
    qual = textstats.quality_score(docs).select("doc_id", "quality")
    lang = textstats.lang_id(docs).select("doc_id", "lang_pred")
    sp = span_dup_flags(deduped).select(
        "doc_id",
        (F.col("n_dup_spans").cast("double") / F.col("n_spans"))
        .alias("_dupfrac"))
    return (
        deduped.select("doc_id")
        .join(qual, "doc_id").where(F.col("quality") >= 0.75)
        .join(lang, "doc_id").where(F.col("lang_pred") == "en")
        .join(sp, "doc_id", "left")
        .where(F.coalesce("_dupfrac", F.lit(0.0)) <= 0.5)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _clean_corpus_sql() -> str:
    return f"""WITH kf AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
qual AS (SELECT doc_id, quality FROM ({SQL_QUALITY})),
lang AS (SELECT doc_id, lang_pred FROM ({SQL_LANG_ID})),
dd AS (SELECT d.doc_id, d.text FROM documents d JOIN kf USING (doc_id)),
{_span_cte(source="dd", suffix="2")},
dups2 AS (SELECT span_md5 FROM spans2 GROUP BY 1
          HAVING count(DISTINCT doc_id) > 1),
sp AS (
  SELECT s.doc_id,
    sum(CASE WHEN d.span_md5 IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
      / count(*) AS dupfrac
  FROM spans2 s LEFT JOIN dups2 d USING (span_md5) GROUP BY 1)
SELECT kf.doc_id::BIGINT AS doc_id
FROM kf JOIN qual USING (doc_id) JOIN lang USING (doc_id)
LEFT JOIN sp USING (doc_id)
WHERE quality >= 0.75 AND lang_pred = 'en'
  AND coalesce(dupfrac, 0.0) <= 0.5"""
