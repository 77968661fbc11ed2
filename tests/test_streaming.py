"""Structured Streaming incremental indexing: micro-batch generations +
sort-merge compaction must equal a fresh batch build over the full corpus
(SURVEY.md §2.10 upgrade)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.build import build_index
from searchengine_spark.operators.segments import segments_to_tf
from searchengine_spark.sources.synth import transcripts_df
from searchengine_spark.streaming.incremental import (
    compact,
    read_state,
    start_incremental,
)


def _tf_set(df):
    return set(map(tuple, df.select("term", "doc_id", "tf", "dl").collect()))


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    """Three arrival batches = three conv ranges written as separate files
    in arrival order (file order == batch order via maxFilesPerTrigger=1)."""
    base = tmp_path_factory.mktemp("stream")
    inp, idx, ckpt = base / "in", base / "idx", base / "ckpt"
    inp.mkdir()
    corpus = transcripts_df(spark, n_convs=60, seed=7)
    convs = sorted(r["conv_id"] for r in corpus.select("conv_id").distinct().collect())
    cuts = [convs[20], convs[40]]
    batches = [
        corpus.filter(F.col("conv_id") < cuts[0]),
        corpus.filter((F.col("conv_id") >= cuts[0]) & (F.col("conv_id") < cuts[1])),
        corpus.filter(F.col("conv_id") >= cuts[1]),
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(str(inp / f"batch_{i}.parquet"))
    return str(inp), str(idx), str(ckpt), corpus, batches


def test_incremental_generations(spark, stream_dirs):
    inp, idx, ckpt, corpus, batches = stream_dirs
    q = start_incremental(spark, f"{inp}/*/", idx, ckpt, available_now=True,
                          df_target=64)
    q.awaitTermination(300)
    state = read_state(idx)
    assert len(state["generations"]) == 3
    assert state["n_docs"] == corpus.count()
    # docID spaces are consecutive in arrival order
    starts = [g["start_id"] for g in state["generations"]]
    sizes = [g["n_docs"] for g in state["generations"]]
    assert starts == [0, sizes[0], sizes[0] + sizes[1]]


def test_compaction_equals_fresh_build(spark, stream_dirs):
    inp, idx, ckpt, corpus, batches = stream_dirs
    merged = compact(spark, idx, df_target=64)

    # fresh build over the corpus concatenated in ARRIVAL order: remap
    # conv_id so global (conv_id, turn_idx) order equals arrival order
    arrival = batches[0].withColumn("arr", F.lit(0))
    for i, b in enumerate(batches[1:], 1):
        arrival = arrival.unionByName(b.withColumn("arr", F.lit(i)))
    remapped = arrival.withColumn(
        "conv_id", F.concat(F.col("arr").cast("string"), F.lit("_"), "conv_id")
    ).drop("arr")
    fresh = build_index(remapped, num_doc_partitions=3, layouts=("term",),
                        df_target=64)
    assert _tf_set(segments_to_tf(merged)) == _tf_set(
        segments_to_tf(fresh.term_segments)
    )


def test_incremental_idempotent_replay(spark, stream_dirs):
    """Re-running the drained stream (fresh checkpoint, same index dir)
    must not duplicate generations (exactly-once via state.json guard)."""
    inp, idx, ckpt, corpus, _ = stream_dirs
    before = read_state(idx)
    q = start_incremental(spark, f"{inp}/*/", idx, ckpt + "_2", available_now=True,
                          df_target=64)
    q.awaitTermination(300)
    after = read_state(idx)
    assert after == before


# ---------------------------------------------------------------------------
# watermarked windowed aggregation (streaming/windowed.py)
# ---------------------------------------------------------------------------

def _ev_rows(spark, rows):
    """rows = [(event_id, 'HH:MM', event_type, value)] on 2024-01-01."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    data = [
        (int(i), base.replace(hour=int(hm[:2]), minute=int(hm[3:])),
         7, et, float(v), "{}")
        for i, hm, et, v in rows
    ]
    from searchengine_spark.streaming.windowed import EVENT_SCHEMA
    return spark.createDataFrame(data, EVENT_SCHEMA)


def test_stream_windowed_counts_watermark_semantics(spark, tmp_path_factory):
    """Append-mode windowed agg: (a) a window is emitted exactly once,
    after the eviction watermark passes its end; (b) rows later than the
    late-event watermark are DROPPED (Spark's late-filter watermark lags
    the eviction watermark by one batch — SPARK-42376 — so the drop is
    guaranteed for rows arriving >= 2 batches after the data that advanced
    the watermark past them); (c) emitted aggregates equal the batch twin
    over the admitted rows."""
    import glob as g
    import shutil
    import time

    from searchengine_spark.streaming.windowed import (
        stream_windowed_counts,
        windowed_event_agg,
    )

    inp = str(tmp_path_factory.mktemp("win_in"))
    out = str(tmp_path_factory.mktemp("win_out"))
    ckpt = str(tmp_path_factory.mktemp("win_ckpt"))

    # file 1: hour-0 + hour-1 data; max ts 01:50 -> wm after batch0 = 01:20
    b1 = [(0, "00:10", "click", 1.0), (1, "00:40", "view", 2.0),
          (2, "01:50", "click", 4.0)]
    # file 2: hour-2 row; during batch1 the eviction wm (01:20) closes and
    # emits hour-0; wm after batch1 = 02:10 - 0:30 = 01:40
    b2 = [(3, "02:10", "click", 8.0)]
    # file 3: a LATE hour-0 row (00:30 < late-filter wm 01:20 => dropped)
    # + an hour-3 row; eviction wm 03:00 - 0:30 = 02:30 closes hour-1
    b3 = [(4, "00:30", "click", 100.0), (5, "03:00", "view", 16.0)]
    for i, rows in enumerate((b1, b2, b3)):
        _ev_rows(spark, rows).coalesce(1).write.parquet(f"{inp}/b{i}")
        f = g.glob(f"{inp}/b{i}/*.parquet")[0]
        shutil.move(f, f"{inp}/part{i}.parquet")
        shutil.rmtree(f"{inp}/b{i}")
        time.sleep(1.1)  # distinct mtimes: file source orders by mtime

    q = stream_windowed_counts(spark, inp, out, ckpt,
                               window="1 hour", watermark="30 minutes")
    q.awaitTermination(300)

    got = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.read.parquet(out).collect()}
    # emitted: hour-0 (both types, WITHOUT the late 100.0) and hour-1;
    # hours 2/3 remain open in state (never emitted before shutdown)
    assert got == {
        ("2024-01-01 00:00:00", "click"): (1, 1.0),
        ("2024-01-01 00:00:00", "view"): (1, 2.0),
        ("2024-01-01 01:00:00", "click"): (1, 4.0),
    }
    # batch twin agrees on the admitted rows of the emitted windows
    admitted = _ev_rows(spark, b1)
    twin = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in windowed_event_agg(admitted).collect()}
    assert twin == got


# ---------------------------------------------------------------------------


def _sess_rows(spark, rows):
    """rows = [(event_id, 'HH:MM', user_id, value)] on 2024-01-01."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    data = [
        (int(i), base.replace(hour=int(hm[:2]), minute=int(hm[3:])),
         int(u), "view", float(v), "{}")
        for i, hm, u, v in rows
    ]
    from searchengine_spark.streaming.windowed import EVENT_SCHEMA
    return spark.createDataFrame(data, EVENT_SCHEMA)


def test_stream_sessionize_stateful(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: (a) a session closes
    in-stream when a same-user event arrives past the gap (data-driven
    close); (b) an idle session closes via EventTimeTimeout once the
    watermark passes last_event + gap; (c) a still-open session is never
    emitted; (d) emitted sessions equal the batch twin
    (operators/events.session_rollup) restricted to closed sessions."""
    import glob as g
    import shutil
    import time

    from searchengine_spark.operators.events import session_rollup
    from searchengine_spark.streaming.sessions import stream_sessions

    inp = str(tmp_path_factory.mktemp("sess_in"))
    out = str(tmp_path_factory.mktemp("sess_out"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))

    # gap 30 min, watermark 10 min
    b1 = [(0, "00:00", 1, 1.0), (1, "00:10", 1, 2.0), (2, "00:05", 2, 4.0)]
    # u1 @01:00: gap 50 > 30 -> closes u1's [00:00, 00:10] in-batch.
    b2 = [(3, "01:00", 1, 8.0)]
    # far-future u99 rows advance the watermark so EventTimeTimeout fires
    # for u2 (00:05 + 30 = 00:35 < wm) ...
    b3 = [(4, "03:00", 99, 16.0)]
    # ... and for u1's second session (01:30 < wm 02:50). u99's own
    # session (still within gap of the latest data) must stay open.
    b4 = [(5, "03:10", 99, 32.0)]
    for i, rows in enumerate((b1, b2, b3, b4)):
        _sess_rows(spark, rows).coalesce(1).write.parquet(f"{inp}/b{i}")
        f = g.glob(f"{inp}/b{i}/*.parquet")[0]
        shutil.move(f, f"{inp}/part{i}.parquet")
        shutil.rmtree(f"{inp}/b{i}")
        time.sleep(1.1)  # distinct mtimes: file source orders by mtime

    q = stream_sessions(spark, inp, out, ckpt,
                        gap_minutes=30, watermark="10 minutes")
    q.awaitTermination(300)

    got = {(r.user_id, str(r.session_start), str(r.session_end),
            r.n_events, r.sum_value)
           for r in spark.read.parquet(out).collect()}
    assert got == {
        (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2, 3.0),
        (2, "2024-01-01 00:05:00", "2024-01-01 00:05:00", 1, 4.0),
        (1, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1, 8.0),
    }

    # batch twin over the same rows: sessionize + per-session rollup,
    # restricted to sessions the final watermark (02:50) had closed
    # (session_end + gap <= wm) — full tuples must match the stream.
    import pyspark.sql.functions as F

    from searchengine_spark.operators.events import sessionize

    all_rows = _sess_rows(spark, b1 + b2 + b3 + b4)
    twin = (
        sessionize(all_rows, gap_minutes=30)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
    )
    import datetime as dt
    wm = dt.datetime(2024, 1, 1, 2, 50)
    gap = dt.timedelta(minutes=30)
    twin_closed = {(r.user_id, str(r.session_start), str(r.session_end),
                    r.n_events, r.sum_value)
                   for r in twin.collect() if r.session_end + gap <= wm}
    assert twin_closed == got


def test_incremental_to_engine_serving(spark, stream_dirs, tmp_path_factory):
    """Round-2 composition: streamed generations -> tombstoned
    compaction -> export_for_serving -> SearchEngine serves the merged
    term layout (mode auto-falls-back to "term"), with deleted docs gone
    and ranking equal to exhaustive scoring over the exported stats."""
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.operators.forward import CorpusScalars
    from searchengine_spark.operators.topk import score_topk
    from searchengine_spark.streaming.incremental import (
        compact,
        export_for_serving,
    )

    inp, idx, ckpt, corpus, batches = stream_dirs
    # self-sufficient: run the incremental build if this test runs alone
    # (in-file order it reuses the state the earlier tests built)
    if not read_state(idx)["generations"]:
        q0 = start_incremental(spark, f"{inp}/*/", idx, ckpt,
                               available_now=True, df_target=64)
        q0.awaitTermination(300)
    dead = {2, 5, 9}
    compact(spark, idx, df_target=64, tombstones=dead)
    out = str(tmp_path_factory.mktemp("served_inc"))
    export_for_serving(spark, idx, out)

    eng = SearchEngine.load(spark, out)
    assert eng.doc_segments is None and eng.term_segments is not None

    q = "bababa dibaba"
    got = [(int(r.doc_id), round(float(r.score), 9))
           for r in eng.search(q, k=25).collect()]
    assert got and not {d for d, _ in got} & dead

    from searchengine_spark.operators.segments import segments_to_tf

    exh = score_topk(segments_to_tf(eng.term_segments),
                     eng.term_stats, eng.scalars, q, k=25)
    want = [(int(r.doc_id), round(float(r.score), 9))
            for r in exh.collect()]
    assert got == want


def test_stream_dedup_exact(spark, tmp_path_factory):
    """In-stream exact dedup: first arrival of each content hash is
    emitted exactly once; later duplicates (within the watermark
    horizon) are dropped; the emitted set equals the batch keep-first
    twin over the same files in arrival order."""
    import datetime as dt

    from searchengine_spark.streaming.dedup_stream import (
        dedup_keep_first,
        stream_dedup_exact,
    )

    base = tmp_path_factory.mktemp("sdedup")
    in_dir, out_dir, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(batch, items):
        return [(f"c{batch}", i, "user", text, None,
                 t0 + dt.timedelta(minutes=batch * 10 + i))
                for i, text in enumerate(items)]

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    # file 0: a, b, dup-a-in-batch; file 1: dup-a, dup-b, c
    spark.createDataFrame(rows(0, ["a text", "b text", "a text"]), schema) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(rows(1, ["a text", "b text", "c text"]), schema) \
        .coalesce(1).write.mode("append").parquet(in_dir)

    q = stream_dedup_exact(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).collect()
    texts = sorted(r.text for r in got)
    assert texts == ["a text", "b text", "c text"]
    # emitted row = FIRST arrival (batch 0 conv for a/b, batch 1 for c)
    by_text = {r.text: r.conv_id for r in got}
    assert by_text["a text"] == "c0" and by_text["b text"] == "c0"
    assert by_text["c text"] == "c1"

    batch = dedup_keep_first(spark.read.parquet(in_dir))
    want = {(r.text, r.conv_id) for r in batch.collect()}
    assert {(r.text, r.conv_id) for r in got} == want
