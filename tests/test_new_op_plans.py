"""Physical-plan hygiene for the round-2 operator additions: the scale
claims in the docstrings (zero-shuffle matching, no-shuffle sampling,
pushed-down term filters on the positional index) asserted on the
actual plans, so a refactor that silently reintroduces a shuffle fails
here, not at 100 TB."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.positional import (
    build_positional,
    phrase_match,
    phrase_match_indexed,
    near_match,
)
from searchengine_spark.operators.sampling import (
    sample_deterministic,
    split_assign,
    stratified_sample,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tree(plan: str) -> str:
    """The operator-tree section (before the node details)."""
    return plan.split("\n\n")[0]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} alpha beta") for i in range(50)],
        "doc_id long, text string",
    )


def test_phrase_match_zero_shuffle(spark, docs):
    tree = _tree(_plan(phrase_match(docs, "alpha beta")))
    assert "Exchange" not in tree, tree


def test_near_match_zero_shuffle(spark, docs):
    tree = _tree(_plan(near_match(docs, "alpha", "gamma", window=4)))
    assert "Exchange" not in tree, tree


def test_sampling_zero_shuffle_and_no_udf(spark, docs):
    for df in (
        sample_deterministic(docs, 0.5),
        split_assign(docs),
        stratified_sample(docs.withColumn("lang", F.lit("en")),
                          {"en": 0.5}, "lang"),
    ):
        plan = _plan(df)
        tree = _tree(plan)
        assert "Exchange" not in tree, tree
        # pure JVM: no UDF-evaluation node anywhere in the plan
        # (the fixture's createDataFrame scan mentions Python; the
        # operators themselves must not add Eval nodes)
        assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_positional_index_query_pushes_term_filter(spark, docs, tmp_path):
    path = str(tmp_path / "posidx")
    build_positional(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    plan = _plan(phrase_match_indexed(postings, "alpha beta"))
    # each leg's term equality must reach the parquet scan
    assert "PushedFilters" in plan
    assert "EqualTo(term,alpha)" in plan.replace(" ", "").replace("'", "") \
        or "EqualTo(term, alpha)" in plan, plan


def test_positional_index_query_correct_after_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "posidx2")
    build_positional(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    got = {r.doc_id: r.ptf
           for r in phrase_match_indexed(postings, "alpha beta").collect()}
    assert len(got) == 50 and all(v == 2 for v in got.values())


def test_pos_layout_build_and_engine(spark, tmp_path_factory):
    """layouts=("doc","pos"): the positional table is persisted with a
    manifest row, resume skips it, and engine.search_phrase over the
    indexed plan is rank+score-identical to the corpus-pass plan."""
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.pipeline import committed_stages, run_build
    from searchengine_spark.sources.synth import transcripts_df

    small = transcripts_df(spark, n_convs=60, seed=7, partitions=4)
    out = str(tmp_path_factory.mktemp("posidx"))
    run_build(spark, small, out, num_doc_partitions=2,
              layouts=("doc", "pos"))
    assert "pos_postings" in committed_stages(out)

    eng = SearchEngine.load(spark, out)
    assert eng.pos_postings is not None
    row = eng.doc_map.select("text").first()
    toks = [t.lower() for t in row["text"].split() if t.isalpha()]
    phrase = f"{toks[0]} {toks[1]}"
    via_index = [(r.doc_id, round(r.score, 9))
                 for r in eng.search_phrase(phrase, k=10).collect()]
    eng_nopos = SearchEngine(
        spark=eng.spark, index_dir=eng.index_dir, doc_map=eng.doc_map,
        term_stats=eng.term_stats, scalars=eng.scalars,
        doc_segments=eng.doc_segments)
    via_scan = [(r.doc_id, round(r.score, 9))
                for r in eng_nopos.search_phrase(phrase, k=10).collect()]
    assert via_index == via_scan and via_index

    # resume: second run must skip the committed stage (no rewrite)
    import os
    mtime = os.path.getmtime(os.path.join(out, "pos_postings.parquet"))
    run_build(spark, small, out, num_doc_partitions=2,
              layouts=("doc", "pos"))
    assert os.path.getmtime(
        os.path.join(out, "pos_postings.parquet")) == mtime


# ---------------------------------------------------------------------------
# second-session additions
# ---------------------------------------------------------------------------

def test_mix_sources_plan_is_a_pure_filter(spark):
    """After the (bounded) count collect, the returned frame must be a
    stateless row filter — no Exchange, no join in its plan."""
    from searchengine_spark.operators.mixing import mix_sources

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        "doc_id long, source string")
    out = mix_sources(docs, {"a": 0.5, "b": 0.5})
    tree = _tree(_plan(out))
    assert "Exchange" not in tree, tree
    assert "Join" not in tree, tree


def test_role_spans_single_window_exchange(spark):
    from searchengine_spark.operators.context import role_spans

    t = spark.createDataFrame(
        [("c", i, "user", "x y z") for i in range(20)],
        "conv_id string, turn_idx int, role string, text string")
    tree = _tree(_plan(role_spans(t)))
    assert tree.count("Exchange") == 1, tree
    assert "Window" in tree


def test_prf_and_mlt_plans_have_no_cartesian(spark):
    """Both two-stage retrievers must keep the query-terms side broadcast
    and never degrade to a nested-loop/cartesian shape."""
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.mlt import more_like_this
    from searchengine_spark.operators.prf import prf_topk

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} words") for i in range(30)],
        "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scal = CorpusScalars.compute(fwd)
    for df in (prf_topk(tf, stats, scal, "alpha", k=5),
               more_like_this(tf, stats, scal, 0, k=5)):
        plan = _plan(df)
        assert "Cartesian" not in plan and "NestedLoop" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_indexed_near_pushes_term_filters(spark, docs, tmp_path):
    from searchengine_spark.operators.positional import near_match_indexed

    path = str(tmp_path / "posidx_near")
    build_positional(docs).write.mode("overwrite").parquet(path)
    postings = spark.read.parquet(path)
    plan = _plan(near_match_indexed(postings, "alpha", "beta", window=3))
    flat = plan.replace(" ", "").replace("'", "")
    assert "PushedFilters" in plan
    assert "EqualTo(term,alpha)" in flat and "EqualTo(term,beta)" in flat, plan


def test_rewrite_and_collapse_plans(spark, docs):
    """Round-3 plan hygiene: rewrite queries broadcast the tiny expansion
    (never sort-merge it), nothing cartesians, and the final top-k is a
    bounded TakeOrderedAndProject."""
    from searchengine_spark.operators.collapse import collapse_topk
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.lexicon import (
        fuzzy_search_topk,
        prefix_search_topk,
        regex_search_topk,
    )

    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scal = CorpusScalars.compute(fwd)
    groups = docs.select("doc_id", (F.col("doc_id") % 5).alias("group"))

    for df in (
        prefix_search_topk(tf, stats, scal, "alp", k=5),
        fuzzy_search_topk(tf, stats, scal, "alpha", k=5),
        regex_search_topk(tf, stats, scal, "^alp", k=5),
        collapse_topk(tf, stats, scal, groups, "alpha beta", k=5),
    ):
        tree = _tree(_plan(df))
        assert "CartesianProduct" not in tree, tree
        assert "BroadcastHashJoin" in tree, tree
        assert "TakeOrderedAndProject" in tree, tree


def test_budget_select_no_global_sort_before_cumsum(spark):
    """budget_select's prefix sum must be the two-phase shape: a range
    Exchange feeding partition-local sorts + mapInPandas — never a
    single-partition global Sort/Window."""
    from searchengine_spark.operators.packing import budget_select

    df = spark.createDataFrame(
        [(i, 1.0 - i * 0.001, 10) for i in range(200)],
        "doc_id long, quality double, n_tokens long")
    selected = budget_select(df, 500, len_col="n_tokens")
    plan = _plan(selected)
    tree = _tree(plan)
    assert "Window" not in tree, tree
    assert "rangepartitioning" in plan.lower(), plan
    # the cumsum itself is the Arrow pass, not a window
    assert "MapInPandas" in tree, tree


def test_new_scorer_plans(spark, docs):
    """Round-3 scorer family plan hygiene: every scorer keeps the
    query-side broadcast, nothing cartesians, the final top-k stays a
    bounded TakeOrderedAndProject, and nothing drags a per-row Python
    UDF into the scoring path."""
    from searchengine_spark.operators.fielded import bm25f_topk
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.lexicon import synonym_search_topk
    from searchengine_spark.operators.topk import (
        decay_topk,
        lm_dirichlet_topk,
    )

    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scal = CorpusScalars.compute(fwd)
    ts = docs.select("doc_id", (F.col("doc_id") * 60.0).alias("ts_s"))
    syn = spark.createDataFrame([("alpha", "beta", 0.5)],
                                "term string, syn string, weight double")

    for df in (
        lm_dirichlet_topk(tf, stats, scal, "alpha beta", k=5),
        decay_topk(tf, stats, scal, ts, "alpha beta",
                   now_s=1e6, half_life_s=3600.0, k=5),
        synonym_search_topk(tf, stats, scal, "alpha", syn, k=5),
        bm25f_topk(docs, stats, 50, "alpha beta", k=5),
    ):
        tree = _tree(_plan(df))
        assert "CartesianProduct" not in tree, tree
        assert "BroadcastHashJoin" in tree, tree
        assert "TakeOrderedAndProject" in tree, tree


def test_bm25f_single_tokenize_pass(spark, docs):
    """The title/body split must tokenize each document ONCE (one
    ArrowEval over the text), not once per field."""
    from searchengine_spark.operators.fielded import build_split_field_tf

    tree = _tree(_plan(build_split_field_tf(docs)))
    n_eval = tree.count("ArrowEvalPython")
    assert n_eval == 1, tree


def test_msm_plan_rides_score_agg(spark, docs):
    """msm_topk's matched-term count must ride the score's hash agg: no
    Expand operator (the countDistinct rewrite this deliberately avoids)
    and EXACTLY as many shuffle exchanges as the plain score_topk plan —
    the count column is free."""
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.topk import msm_topk, score_topk

    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scalars = CorpusScalars.compute(fwd)

    def _shuffles(df):
        tree = _tree(_plan(df))
        return tree, [ln for ln in tree.splitlines()
                      if "Exchange" in ln and "BroadcastExchange" not in ln]

    mtree, mex = _shuffles(
        msm_topk(tf, stats, scalars, "alpha beta", min_should_match=2))
    btree, bex = _shuffles(score_topk(tf, stats, scalars, "alpha beta"))
    assert "Expand" not in mtree, mtree
    assert len(mex) == len(bex), mtree + "\n====\n" + btree


def test_round3c_plans(spark, docs):
    """Round-3c plan hygiene: dis_max and function_score keep the
    query-broadcast + bounded-top-k shape; the facet sub-aggs broadcast
    the k-row hit set (never shuffle the doc store toward the hits) and
    facet_top_hits compiles its per-bucket rank to WindowGroupLimit;
    facet_ranges is ONE aggregate (no per-range jobs)."""
    from searchengine_spark.operators.facets import (
        facet_ranges,
        facet_stats,
        facet_top_hits,
    )
    from searchengine_spark.operators.fielded import (
        build_split_field_tf,
        dis_max_topk,
    )
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.topk import function_score_topk

    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scal = CorpusScalars.compute(fwd)
    ftf = build_split_field_tf(docs, title_len=3)
    attr = docs.select("doc_id", F.length("text").alias("v"))

    for df in (
        dis_max_topk(ftf, stats, scal.n_docs, "alpha beta", k=5),
        function_score_topk(tf, stats, scal, attr, "alpha beta",
                            attr="v", k=5),
    ):
        tree = _tree(_plan(df))
        assert "CartesianProduct" not in tree, tree
        assert "BroadcastHashJoin" in tree, tree
        assert "TakeOrderedAndProject" in tree, tree

    hits = docs.select("doc_id").limit(10)
    scored = docs.select("doc_id", F.lit(1.0).alias("score")).limit(10)
    for df in (
        facet_stats(hits, docs.select("doc_id", "text", "doc_id"
                                      ).select("doc_id", F.col("text").alias("src"),
                                               F.col("doc_id").alias("v")),
                    by="src", attr="v"),
        facet_ranges(hits, attr, [("a", None, 5.0), ("b", 5.0, None)],
                     attr="v"),
    ):
        tree = _tree(_plan(df))
        assert "BroadcastHashJoin" in tree, tree
        assert "CartesianProduct" not in tree, tree
    th_tree = _tree(_plan(facet_top_hits(
        scored, docs.select("doc_id", F.col("text").alias("src")),
        by="src", per_bucket=2)))
    assert "WindowGroupLimit" in th_tree, th_tree


def test_federated_wand_single_grouped_stage(spark, docs):
    """The federated-WAND union must reach the kernel as ONE grouped
    stage (no per-slice jobs): a single FlatMapGroupsInArrow/
    ApplyInPandas node over the unioned, slice-unique-sharded rows."""
    from searchengine_spark.operators.federation import federated_wand_topk
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.segments import build_doc_segments

    seg, st, sc = [], [], []
    for i, cond in enumerate([F.col("doc_id") % 2 == 0,
                              F.col("doc_id") % 2 == 1]):
        fwd = build_forward(docs.filter(cond))
        tf = explode_forward(fwd)
        stats = build_term_stats(tf)
        scals = CorpusScalars.compute(fwd)
        seg.append((f"s{i}", build_doc_segments(
            tf, stats, scals.n_docs, scals.avgdl, n_shards=2)))
        st.append(stats)
        sc.append(scals)
    out = federated_wand_topk(seg, st, sc, "alpha beta", k=5)
    tree = _tree(_plan(out))
    n_grouped = tree.count("FlatMapGroupsInPandas") \
        + tree.count("FlatMapGroupsInArrow")
    assert n_grouped == 1, tree


def test_ltr_and_percentile_plans(spark, docs):
    """ltr_features: query-broadcast join, candidate cap compiles to
    WindowGroupLimit (bounded per-query heap), no cartesian.
    facet_percentiles: hit-set broadcast, one aggregate."""
    from searchengine_spark.operators.facets import facet_percentiles
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.ltr import ltr_features

    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scal = CorpusScalars.compute(fwd)
    qs = spark.createDataFrame([(0, "alpha beta")],
                               "query_id int, query string")
    tree = _tree(_plan(ltr_features(qs, tf, stats, scal, k=5)))
    assert "BroadcastHashJoin" in tree, tree
    assert "WindowGroupLimit" in tree, tree
    assert "CartesianProduct" not in tree, tree

    hits = docs.select("doc_id").limit(10)
    attrs = docs.select("doc_id", F.col("text").alias("src"),
                        F.length("text").alias("v"))
    ptree = _tree(_plan(facet_percentiles(hits, attrs, "src", "v")))
    assert "BroadcastHashJoin" in ptree, ptree
    assert "CartesianProduct" not in ptree, ptree
