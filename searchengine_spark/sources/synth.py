"""Deterministic synthetic transcripts corpus + reference query set.

Shape mandated by BASELINE.json input_hint:
    transcripts(conv_id:string, turn_idx:int32, role:string,
                text:string, tool:string, ts:timestamp)

Generation is seeded numpy (seed=42 by default), pure-Python — no external
data (FIXTURES.md §1-2). Text is a bag of Zipfian vocabulary words so the
corpus has skewed high-df "stopword-like" terms, interleaved with
punctuation, digits, non-ASCII tokens ("café", "naïve") and >20-char tokens
to exercise the tokenizer drop rules (reference semantics:
SearchEngine Indexer/Program.cs:100-110).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
]
_NOISE = ["...", "42", "7x", "--", "café", "naïve", "!!", "(9)",
          "pneumonoultramicroscopicsilicovolcanoconiosis", "„“"]
ROLES = ["user", "assistant", "tool"]
TOOLS = ["bash", "search", "editor"]
_BASE_TS = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)


def vocab(n: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pure-alphabetic vocabulary (tokenizer-stable words)."""
    words = []
    base = len(_SYLLABLES)
    for i in range(n):
        j, parts = i, []
        for _ in range(3):
            parts.append(_SYLLABLES[j % base])
            j //= base
        words.append("".join(parts))
    return words


def transcripts_pdf(n_convs: int = 500, seed: int = SEED) -> pd.DataFrame:
    """Generate a transcripts corpus as pandas (driver-side, deterministic).

    ~4 turns/conv on average => n_convs=500 -> ~2000 turns.
    """
    rng = np.random.default_rng(seed)
    words = np.array(vocab())
    conv_lens = np.minimum(1 + rng.zipf(2.0, size=n_convs), 40)
    n_turns = int(conv_lens.sum())

    conv_ids = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = np.concatenate([np.arange(l) for l in conv_lens]).astype(np.int32)

    # Zipfian term draws: ~5-60 words per turn
    turn_words = rng.integers(5, 61, size=n_turns)
    total_words = int(turn_words.sum())
    # Zipf over vocabulary ranks (clip into vocab)
    draws = np.minimum(rng.zipf(1.3, size=total_words) - 1, VOCAB_SIZE - 1)
    offsets = np.zeros(n_turns + 1, np.int64)
    np.cumsum(turn_words, out=offsets[1:])

    noise_mask = rng.random(n_turns) < 0.30  # 30% of turns get a noise token
    noise_pick = rng.integers(0, len(_NOISE), size=n_turns)
    empty_mask = rng.random(n_turns) < 0.05  # ~5% empty/whitespace

    texts = []
    for i in range(n_turns):
        if empty_mask[i]:
            texts.append("" if i % 2 == 0 else "   ")
            continue
        ws = words[draws[offsets[i]:offsets[i + 1]]].tolist()
        if noise_mask[i]:
            ws.insert(int(rng.integers(0, len(ws) + 1)), _NOISE[noise_pick[i]])
        # occasional punctuation joins ("don't"-style splits)
        txt = " ".join(ws)
        if i % 7 == 0 and len(ws) > 2:
            txt = txt.replace(" ", "'", 1)
        texts.append(txt)

    roles = np.array(ROLES)[
        np.where(rng.random(n_turns) < 0.1, 2, (turn_idx % 2)).astype(int)
    ]
    tools = np.where(
        roles == "tool",
        np.array(TOOLS)[rng.integers(0, len(TOOLS), size=n_turns)],
        None,
    )
    ts = [
        _BASE_TS + _dt.timedelta(seconds=int(c) * 3600 + int(t) * 30)
        for c, t in zip(conv_ids, turn_idx)
    ]
    return pd.DataFrame(
        {
            "conv_id": [f"conv{int(c):08d}" for c in conv_ids],
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_df(spark, n_convs: int = 500, seed: int = SEED, partitions: int | None = None):
    """Synthetic transcripts as a Spark DataFrame (input_hint schema)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    pdf = transcripts_pdf(n_convs, seed)
    df = spark.createDataFrame(pdf, schema=schema)
    if partitions:
        df = df.repartition(partitions)
    return df


def transcripts_spark(spark, n_convs: int, seed: int = SEED,
                      partitions: int | None = None):
    """Distributed deterministic transcripts generator (bench-scale corpora).

    Each conversation is generated from ``default_rng((seed, conv_id))``, so
    the corpus is IDENTICAL regardless of partitioning/parallelism — the
    "same input at N and 4N cores" requirement of the scaling harness —
    and generation cost scales out instead of serializing on the driver
    (at 10^12 turns a driver-side generator is impossible anyway).

    Statistics mirror ``transcripts_pdf``: Zipfian vocab draws (skewed
    high-df terms), 5-60 words/turn, ~5% empty turns, noise tokens that
    exercise the tokenizer drop rules.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    base = _BASE_TS.replace(tzinfo=None)

    def gen(batches):
        words = np.array(vocab())
        nv = len(words)
        noise = _NOISE
        for pdf in batches:
            conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
            for cid in pdf["id"]:
                cid = int(cid)
                rng = np.random.default_rng((seed, cid))
                n_turns = int(min(1 + rng.zipf(2.0), 40))
                twords = rng.integers(5, 61, size=n_turns)
                draws = np.minimum(rng.zipf(1.3, size=int(twords.sum())) - 1, nv - 1)
                empty = rng.random(n_turns) < 0.05
                noisy = rng.random(n_turns) < 0.30
                npick = rng.integers(0, len(noise), size=n_turns)
                toolish = rng.random(n_turns) < 0.1
                off = 0
                for t in range(n_turns):
                    k = int(twords[t])
                    if empty[t]:
                        txt = "" if t % 2 == 0 else "   "
                    else:
                        ws = words[draws[off:off + k]].tolist()
                        if noisy[t]:
                            ws.insert(k // 2, noise[npick[t]])
                        txt = " ".join(ws)
                    off += k
                    role = "tool" if toolish[t] else ("user" if t % 2 == 0 else "assistant")
                    conv_ids.append(f"conv{cid:010d}")
                    turn_idxs.append(t)
                    roles.append(role)
                    texts.append(txt)
                    tools.append(TOOLS[t % len(TOOLS)] if role == "tool" else None)
                    tss.append(base + _dt.timedelta(seconds=cid * 3600 + t * 30))
            yield pd.DataFrame(
                {
                    "conv_id": conv_ids,
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": tss,
                }
            )

    return (
        spark.range(0, n_convs, 1, partitions)
        .mapInPandas(gen, schema=schema)
    )


def queries_pdf(n_queries: int = 100, seed: int = SEED) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): 1-5 words; duplicate-term,
    hot-term, rare-term, absent-term, and mixed queries included."""
    rng = np.random.default_rng(seed + 1)
    words = vocab()
    hot = words[0]
    rare = words[-1]
    rows = []
    for qid in range(n_queries):
        kind = qid % 10
        if kind == 0:
            q = hot
        elif kind == 1:
            q = rare
        elif kind == 2:
            q = "zzzabsent qqqmissing"  # absent terms
        elif kind == 3:
            w = words[int(rng.integers(0, 50))]
            q = f"{w} {w}"  # duplicate term, qf=2
        elif kind == 4:
            q = f"{hot} {rare}"  # hot + rare mix
        else:
            k = int(rng.integers(1, 6))
            q = " ".join(words[int(i)] for i in rng.integers(0, VOCAB_SIZE, size=k))
        rows.append((qid, q))
    return pd.DataFrame(rows, columns=["query_id", "query"])


TINY_FIXTURE = [
    # 12-turn hand-written fixture with known tokenization edges
    # (conv_id, turn_idx, role, text)
    ("c0", 0, "user", "don't stop"),
    ("c0", 1, "assistant", "café au lait"),
    ("c0", 2, "user", "pneumonoultramicroscopicsilicovolcanoconiosis short"),
    ("c0", 3, "assistant", "abc123def separators"),
    ("c1", 0, "user", "Upper CASE folding"),
    ("c1", 1, "assistant", "repeat repeat repeat term"),
    ("c1", 2, "user", ""),
    ("c1", 3, "assistant", "   "),
    ("c2", 0, "user", "mixed naïve words don t"),
    ("c2", 1, "assistant", "the the the of of a"),
    ("c2", 2, "user", "tail token"),
    ("c2", 3, "assistant", "don't don't stop stop stop"),
]


def tiny_df(spark):
    """Hand-written 12-turn fixture (FIXTURES.md §3)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    rows = [
        (c, t, r, x, None, _BASE_TS + _dt.timedelta(minutes=i))
        for i, (c, t, r, x) in enumerate(TINY_FIXTURE)
    ]
    return spark.createDataFrame(rows, schema=schema)
