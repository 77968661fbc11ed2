"""Text analysis: transcripts context, LM scores, lang-id, quality, tokens.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators import textstats
from searchengine_spark.entry._shared import (BASE_CTES, _TOKS_TEXT, _docs, _index_parts)


def _as_transcripts(spark, sf_dir):
    """documents proxied into the transcript shape: source = conv_id,
    doc_id = turn ordering (the operators need order, not contiguity)."""
    return _docs(spark, sf_dir).select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        "text",
    )


def q_turn_context(spark, sf_dir, n_prev: int = 2):
    """Sliding context-window assembly (operators/context.py): each turn
    + up to n_prev preceding turns of its conversation, one ordered
    window over the conv-id partition."""
    from searchengine_spark.operators.context import context_windows

    out = context_windows(_as_transcripts(spark, sf_dir), n_prev=n_prev)
    return out.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        F.md5("context").alias("ctx_md5"),
    )


SQL_TURN_CONTEXT = """SELECT source AS conv_id, doc_id::BIGINT AS turn_idx,
md5(string_agg(text, chr(10)) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS ctx_md5
FROM documents"""


def q_conversation_text(spark, sf_dir):
    """Whole-conversation assembly (operators/context.py): one hash agg,
    in-row struct sort — no window/sort shuffle."""
    from searchengine_spark.operators.context import conversation_text

    out = conversation_text(_as_transcripts(spark, sf_dir))
    return out.select("conv_id", "n_turns",
                      F.md5("conv_text").alias("conv_md5"))


SQL_CONVERSATION_TEXT = """SELECT source AS conv_id,
count(*)::BIGINT AS n_turns,
md5(string_agg(text, chr(10) ORDER BY doc_id)) AS conv_md5
FROM documents GROUP BY 1"""


def q_role_spans(spark, sf_dir):
    """Per-turn character offsets into the assembled conversation text
    (operators/context.py role_spans) — the SFT loss-mask artifact
    (train on assistant spans, mask the rest). Role is derived
    deterministically (turn_idx parity) since the proxy table has none;
    conv_text[start:end] == turn text is pinned in pytest."""
    from searchengine_spark.operators.context import role_spans

    t = _as_transcripts(spark, sf_dir).withColumn(
        "role",
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant"),
    )
    out = role_spans(t)
    return out.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        "role", "start", F.col("end").alias("end_c"),
    )


SQL_ROLE_SPANS = """SELECT source AS conv_id, doc_id::BIGINT AS turn_idx,
  CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
  coalesce(sum(length(text) + 1) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start,
  (coalesce(sum(length(text) + 1) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
   + length(text))::BIGINT AS end_c
FROM documents"""


def _tool_transcripts(spark, sf_dir):
    """Transcript proxy with a deterministic tool column (the proxy table
    has none): every 5th turn is a bash call, every 5th+1 a search."""
    return _as_transcripts(spark, sf_dir).withColumn(
        "tool",
        F.when(F.col("turn_idx") % 5 == 0, "bash")
        .when(F.col("turn_idx") % 5 == 1, "search")
        .otherwise(F.lit(None).cast("string")),
    )


def q_tool_usage(spark, sf_dir):
    """Per-tool usage profile over transcripts (operators/temporal.py
    tool_usage): call counts, conversation reach, mean position in the
    conversation. Output bounded by |tools|."""
    from searchengine_spark.operators.temporal import tool_usage

    return tool_usage(_tool_transcripts(spark, sf_dir))


SQL_TOOL_USAGE = """WITH t AS (
  SELECT source AS conv_id, doc_id AS turn_idx,
    CASE WHEN doc_id % 5 = 0 THEN 'bash'
         WHEN doc_id % 5 = 1 THEN 'search' END AS tool
  FROM documents),
ln AS (SELECT conv_id, max(turn_idx) AS max_idx FROM t GROUP BY 1)
SELECT tool, count(*)::BIGINT AS n_calls,
  count(DISTINCT conv_id)::BIGINT AS n_convs,
  round(avg(CASE WHEN max_idx > 0 THEN turn_idx::DOUBLE / max_idx
                 ELSE 0.0 END), 6) AS mean_turn_frac
FROM t JOIN ln USING (conv_id)
WHERE tool IS NOT NULL GROUP BY 1"""


def q_tool_transitions(spark, sf_dir):
    """Tool-sequence mining over transcripts (operators/temporal.py
    tool_transitions): which tool follows which, within conversations.
    Output bounded by |tools|²."""
    from searchengine_spark.operators.temporal import tool_transitions

    return tool_transitions(_tool_transcripts(spark, sf_dir))


SQL_TOOL_TRANSITIONS = """WITH t AS (
  SELECT source AS conv_id, doc_id AS turn_idx,
    CASE WHEN doc_id % 5 = 0 THEN 'bash'
         WHEN doc_id % 5 = 1 THEN 'search' END AS tool
  FROM documents),
seq AS (
  SELECT lag(tool) OVER (PARTITION BY conv_id
                         ORDER BY turn_idx) AS prev_tool, tool
  FROM t WHERE tool IS NOT NULL)
SELECT prev_tool, tool, count(*)::BIGINT AS n_pairs
FROM seq WHERE prev_tool IS NOT NULL GROUP BY 1, 2"""


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (operators/sampling.py):
    membership = pure function of md5(doc_id || salt) — stable across
    runs, partitionings, and engines; no RNG, no shuffle."""
    from searchengine_spark.operators.sampling import split_assign

    return split_assign(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"), "split")


_DUCK_BUCKET = ("(('0x' || substring(md5(doc_id::VARCHAR || '|{salt}'), 1, 8))"
                "::BIGINT % 10000)")

SQL_SPLIT_ASSIGN = f"""SELECT doc_id::BIGINT AS doc_id,
CASE WHEN {_DUCK_BUCKET.format(salt='split-v1')} < 9000 THEN 'train'
     WHEN {_DUCK_BUCKET.format(salt='split-v1')} < 9500 THEN 'val'
     ELSE 'test' END AS split
FROM documents"""


def q_stratified_sample(spark, sf_dir):
    """Per-language deterministic downsampling (operators/sampling.py):
    keep 100% of rare langs, 25% of dominant 'en' — the rebalancing move
    every multilingual training pipeline makes."""
    from searchengine_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        _docs(spark, sf_dir), rates={"en": 0.25}, strata_col="lang",
        default_rate=1.0)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


SQL_STRATIFIED_SAMPLE = f"""SELECT doc_id::BIGINT AS doc_id, lang
FROM documents
WHERE {_DUCK_BUCKET.format(salt='strata-v1')}
      < CAST((CASE WHEN lang = 'en' THEN 0.25 ELSE 1.0 END) * 10000 AS BIGINT)"""


def q_bigram_pmi(spark, sf_dir):
    """Corpus bigram collocations by PMI (operators/collocations.py):
    in-row zip_with bigram formation, two hash aggs, broadcast unigram
    join — no window, no position self-join."""
    from searchengine_spark.operators.collocations import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir), min_count=5, k=20)


SQL_BIGRAM_PMI = f"""WITH
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
uni AS (SELECT unnest(t) AS term FROM tokd),
c1 AS (SELECT term, count(*)::BIGINT AS c FROM uni GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM uni)::DOUBLE AS t1,
               (SELECT sum(greatest(len(t) - 1, 0)) FROM tokd)::DOUBLE AS t2),
big AS (SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
        i -> concat_ws(' ', t[i], t[i+1]))) AS bigram FROM tokd),
bc AS (SELECT bigram, count(*)::BIGINT AS n FROM big
       GROUP BY 1 HAVING count(*) >= 5)
SELECT bigram, n,
       round(ln((n / t.t2) / ((a.c / t.t1) * (b.c / t.t1))), 6) AS pmi
FROM bc JOIN c1 a ON a.term = split_part(bigram, ' ', 1)
        JOIN c1 b ON b.term = split_part(bigram, ' ', 2)
CROSS JOIN tot t
ORDER BY pmi DESC, bigram ASC LIMIT 20"""


def q_repetition_stats(spark, sf_dir):
    """Degenerate-text detector (operators/textstats.py
    repetition_stats): share of a doc's 3-grams taken by its most
    repeated 3-gram — in-row list algebra, no explode/shuffle."""
    return textstats.repetition_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_ngrams", "top_ngram_frac")


SQL_REPETITION_STATS = f"""WITH
tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
grams AS (SELECT doc_id,
  CASE WHEN len(t) >= 3
       THEN list_transform(range(1, len(t) - 1),
                           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
       ELSE [] END AS g FROM tokd)
SELECT doc_id, len(g)::BIGINT AS n_ngrams,
  CASE WHEN len(g) > 0 THEN round(
    list_max(list_transform(list_distinct(g),
                            x -> len(list_filter(g, y -> y = x))))::DOUBLE
    / len(g), 6)
  ELSE 0.0 END AS top_ngram_frac
FROM grams"""


_PII_SUFFIX = (" contact a.b@example.org or https://ex.io ;"
               " call +1 555-123-4567 at 10.0.0.1")


def q_pii_scan(spark, sf_dir):
    """PII-shaped span counts (operators/textstats.py pii_scan):
    emails/URLs/phones/IPv4s per doc, JVM regexp_count columns. The sf
    corpus contains no digits/URLs, so a deterministic PII suffix is
    planted on every 7th doc (identically in the oracle) — the gate
    compares NONZERO counts, not a vacuous all-zeros frame."""
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(_PII_SUFFIX)))
        .otherwise(F.col("text")),
    )
    return textstats.pii_scan(docs)


SQL_PII_SCAN = rf"""WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || '{_PII_SUFFIX}'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))::BIGINT AS emails,
len(regexp_extract_all(text, 'https?://[^\s]+'))::BIGINT AS urls,
len(regexp_extract_all(text, '\+?\d[\d\-\s()]{{7,}}\d'))::BIGINT AS phones,
len(regexp_extract_all(text, '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b'))::BIGINT AS ipv4s
FROM aug"""


def q_doc_logprob(spark, sf_dir):
    """Perplexity-proxy quality filter (operators/textstats.py
    doc_unigram_logprob): per-doc average unigram-LM logprob against the
    corpus distribution; one hash join + one per-doc agg."""
    from searchengine_spark.operators.textstats import doc_unigram_logprob

    _, _, tf_table, stats, scalars = _index_parts(spark, sf_dir)
    out = doc_unigram_logprob(tf_table, stats, scalars.sum_dl)
    return out.select("doc_id", "dl",
                      F.round("avg_logprob", 6).alias("avg_logprob"))


SQL_DOC_LOGPROB = f"""WITH {BASE_CTES}
SELECT tf.doc_id, max(dl.dl)::BIGINT AS dl,
       round(sum(tf.tf * ln(s.cf / (SELECT sum(dl)::DOUBLE FROM dl)))
             / max(dl.dl), 6) AS avg_logprob
FROM tf JOIN stats s USING (term) JOIN dl USING (doc_id)
GROUP BY 1"""


def q_doc_bigram_logprob(spark, sf_dir):
    """Stupid-backoff bigram-LM quality score (operators/textstats.py
    doc_bigram_logprob): corpus-attested continuations score
    count(w1w2)/cf(w1), singleton bigrams back off to α·unigram —
    sharper than the unigram filter at catching word salad. Hash joins
    only, nothing vocabulary-sized broadcast."""
    from searchengine_spark.operators.textstats import doc_bigram_logprob

    docs, _, _, stats, scalars = _index_parts(spark, sf_dir)
    return doc_bigram_logprob(docs, stats, scalars.sum_dl)


SQL_DOC_BIGRAM_LOGPROB = f"""WITH {BASE_CTES},
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM tokd),
bc AS (SELECT bigram, count(*)::BIGINT AS c2 FROM bg GROUP BY 1),
inst AS (
  SELECT bg.doc_id,
    CASE WHEN bc.c2 >= 2
         THEN ln(bc.c2 / s1.cf)
         ELSE ln(0.4 * s2.cf / (SELECT sum(dl)::DOUBLE FROM dl)) END AS lp
  FROM bg JOIN bc USING (bigram)
  JOIN stats s1 ON s1.term = split_part(bg.bigram, ' ', 1)
  JOIN stats s2 ON s2.term = split_part(bg.bigram, ' ', 2))
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
  round(sum(lp) / count(*), 5) AS avg_logprob
FROM inst GROUP BY 1"""


def q_source_divergence(spark, sf_dir):
    """Per-source KL drift vs the corpus unigram distribution
    (operators/textstats.py source_divergence)."""
    from searchengine_spark.operators.textstats import source_divergence

    docs, _, tf_table, _, scalars = _index_parts(spark, sf_dir)
    out = source_divergence(tf_table, docs.select("doc_id", "source"),
                            scalars.sum_dl)
    return out.select("source", F.round("kl", 6).alias("kl"))


SQL_SOURCE_DIVERGENCE = f"""WITH {BASE_CTES},
st AS (SELECT d.source, tf.term, sum(tf.tf)::BIGINT AS cfs
       FROM tf JOIN documents d USING (doc_id) GROUP BY 1, 2),
stot AS (SELECT source, sum(cfs)::BIGINT AS ts FROM st GROUP BY 1)
SELECT st.source,
       round(sum((st.cfs::DOUBLE / stot.ts)
                 * ln((st.cfs::DOUBLE / stot.ts)
                      / (s.cf / (SELECT sum(dl)::DOUBLE FROM dl)))), 6) AS kl
FROM st JOIN stot USING (source) JOIN stats s USING (term)
GROUP BY 1"""


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


_STOPLIST = "[" + ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS) + "]"

SQL_LANG_ID = f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents)
SELECT doc_id,
  round(CASE WHEN coalesce(len(t), 0) > 0
        THEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t)
        ELSE 0.0 END, 6) AS en_ratio,
  CASE WHEN coalesce(len(t), 0) = 0 THEN 'unknown'
       WHEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t) > 0.05 THEN 'en'
       ELSE 'other' END AS lang_pred
FROM tokd"""


def q_quality(spark, sf_dir):
    df = textstats.quality_score(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "alpha_ratio",
        "stop_ratio",
        "quality",
    )


SQL_QUALITY = f"""WITH tokd AS (
  SELECT d.doc_id, {_TOKS_TEXT} AS t, coalesce(d.text, '') AS txt FROM documents d
),
m AS (
  SELECT doc_id,
    coalesce(len(t), 0)::BIGINT AS n_tokens,
    CASE WHEN coalesce(len(t), 0) > 0
         THEN coalesce(list_sum(list_transform(t, x -> length(x))), 0)::DOUBLE / len(t)
         ELSE 0.0 END AS mean_token_len,
    CASE WHEN length(txt) > 0
         THEN length(regexp_replace(txt, '[^A-Za-z]', '', 'g'))::DOUBLE / length(txt)
         ELSE 0.0 END AS alpha_ratio,
    CASE WHEN coalesce(len(t), 0) > 0
         THEN len(list_filter(t, x -> list_contains({_STOPLIST}, x)))::DOUBLE / len(t)
         ELSE 0.0 END AS stop_ratio
  FROM tokd
)
SELECT doc_id, n_tokens, round(mean_token_len, 6) AS mean_token_len,
  round(alpha_ratio, 6) AS alpha_ratio, round(stop_ratio, 6) AS stop_ratio,
  round(least(n_tokens / 20.0, 1.0) * 0.4 + alpha_ratio * 0.4
        + least(stop_ratio * 5.0, 1.0) * 0.2, 6) AS quality
FROM m"""


def q_token_counts(spark, sf_dir):
    df = textstats.token_counts(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_alpha_tokens").cast("long").alias("n_alpha_tokens"),
        F.col("n_bpeish_tokens").cast("long").alias("n_bpeish_tokens"),
    )


SQL_TOKEN_COUNTS = f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents)
SELECT d.doc_id,
  length(coalesce(d.text, ''))::BIGINT AS n_chars,
  len(list_filter(regexp_split_to_array(coalesce(d.text, ''), '\\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
  coalesce(len(t.t), 0)::BIGINT AS n_alpha_tokens,
  len(regexp_extract_all(coalesce(d.text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))::BIGINT AS n_bpeish_tokens
FROM documents d JOIN tokd t ON d.doc_id = t.doc_id"""


def q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_docs(spark, sf_dir))


SQL_FINGERPRINT = f"""WITH tokd AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents)
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(coalesce(t, []))), ' ')) AS fp
FROM tokd"""
