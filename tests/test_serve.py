"""HTTP serving loop (serve.py) — the reference Engine's listener analog
(Engine.cs:32-96): load once, serve /search + /doc + /healthz, JSON out.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from pyspark.sql import functions as F

from searchengine_spark.engine import SearchEngine
from searchengine_spark.pipeline import run_build
from searchengine_spark.serve import EngineServer


@pytest.fixture(scope="module")
def served(spark, small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srvidx"))
    run_build(spark, small, out, num_doc_partitions=3, layouts=("doc",))
    eng = SearchEngine.load(spark, out)
    with EngineServer(eng) as srv:
        yield eng, f"http://{srv.host}:{srv.port}"


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(served):
    eng, base = served
    status, body = _get(f"{base}/healthz")
    assert status == 200
    assert body == {"status": "ok", "n_docs": eng.scalars.n_docs}


def test_search_matches_engine_api(served):
    eng, base = served
    q = "babace badi"  # vocab words present in the synthetic corpus
    status, body = _get(f"{base}/search?q={q.replace(' ', '+')}&k=5")
    assert status == 200
    assert body["mode"] == "wand" and body["k"] == 5
    direct = [(int(r["doc_id"]), round(float(r["score"]), 9))
              for r in eng.search(q, k=5).collect()]
    via_http = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert via_http == direct
    assert body["took_ms"] >= 0


def test_doc_fetch_and_404(served):
    eng, base = served
    status, body = _get(f"{base}/doc?id=0")
    assert status == 200 and body["doc_id"] == 0 and "text" in body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{base}/doc?id=99999999")
    assert ei.value.code == 404


def test_bad_mode_is_400(served):
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{base}/search?q=x&mode=bogus")
    assert ei.value.code == 400


def test_engine_term_mode_matches_wand(spark, small, tmp_path_factory):
    """mode='term' (term-partitioned WAND over the merged/incremental
    layout) ranks identically to the doc-sharded WAND path; an index
    with ONLY the term layout is served transparently."""
    from searchengine_spark.pipeline import run_build

    out = str(tmp_path_factory.mktemp("termidx"))
    run_build(spark, small, out, num_doc_partitions=3,
              layouts=("doc", "term"))
    eng = SearchEngine.load(spark, out)
    q = "bababa zumuqi"

    def ranked(df):
        return [(int(r.doc_id), round(float(r.score), 9))
                for r in df.collect()]

    assert ranked(eng.search(q, k=15, mode="term")) == \
        ranked(eng.search(q, k=15, mode="wand"))

    # doc layout absent -> mode="wand" silently serves via term layout
    import os as _os
    import shutil as _sh
    _sh.rmtree(_os.path.join(out, "doc_segments.parquet"))
    eng2 = SearchEngine.load(spark, out)
    assert eng2.doc_segments is None and eng2.term_segments is not None
    assert ranked(eng2.search(q, k=15)) == \
        ranked(eng.search(q, k=15, mode="term"))


def test_suggest_endpoints(served):
    eng, base = served
    status, body = _get(f"{base}/suggest?prefix=ba&k=3")
    assert status == 200 and body["suggestions"]
    assert all(s["term"].startswith("ba") for s in body["suggestions"])
    top = body["suggestions"][0]["term"]
    typo = top[:-1] + "x"
    status, body = _get(f"{base}/suggest?term={typo}&k=3")
    assert status == 200
    assert body["suggestions"][0]["term"] == top
    assert body["suggestions"][0]["dist"] == 1
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{base}/suggest?k=3")
    assert ei.value.code == 400


def test_search_convs(served):
    """Conversation-level retrieval: per-conv score is the max/sum of its
    turn scores; best_doc_id is the top turn; equivalent to a manual
    rollup of the turn-level result."""
    import collections

    from pyspark.sql import functions as F

    eng, _ = served
    q = "bababa zumuqi"
    turns = eng.search(q, k=200).collect()
    doc_conv = {r.doc_id: r.conv_id for r in
                eng.doc_map.select("doc_id", "conv_id").collect()}
    by_conv = collections.defaultdict(list)
    for r in turns:
        by_conv[doc_conv[r.doc_id]].append((r.score, r.doc_id))

    got = eng.search_convs(q, k=5, agg="max").collect()
    assert len(got) == 5
    want = sorted(((max(s for s, _ in v), c) for c, v in by_conv.items()),
                  key=lambda x: (-x[0], x[1]))[:5]
    assert [(round(r.conv_score, 9), r.conv_id) for r in got] == \
        [(round(s, 9), c) for s, c in want]
    for r in got:
        scores = by_conv[r.conv_id]
        assert r.n_matching_turns == len(scores)
        assert r.best_doc_id == max(scores)[1]

    got_sum = eng.search_convs(q, k=5, agg="sum").collect()
    want_sum = sorted(((sum(s for s, _ in v), c) for c, v in by_conv.items()),
                      key=lambda x: (-x[0], x[1]))[:5]
    assert [(round(r.conv_score, 6), r.conv_id) for r in got_sum] == \
        [(round(s, 6), c) for s, c in want_sum]


def test_search_with_snippets(served):
    eng, base = served
    status, body = _get(f"{base}/search?q=bababa&k=3&snippets=1")
    assert status == 200 and len(body["results"]) == 3
    for r in body["results"]:
        assert "bababa" in r["snippet"].lower()


def test_search_phrase_and_near_modes(served):
    eng, base = served
    # pick an actually-occurring bigram from the doc store
    row = eng.doc_map.select("text").first()
    toks = [t.lower() for t in row["text"].split() if t.isalpha()]
    phrase = f"{toks[0]} {toks[1]}"
    status, body = _get(
        f"{base}/search?q={phrase.replace(' ', '+')}&mode=phrase&k=5")
    assert status == 200 and body["mode"] == "phrase"
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.search_phrase(phrase, k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct and len(got) > 0

    status, body = _get(
        f"{base}/search?q={toks[0]}+{toks[2]}&mode=near&w=4&k=5")
    assert status == 200
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.search_near(toks[0], toks[2], window=4,
                                       k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct


def test_near_mode_needs_two_terms(served):
    _, base = served
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/search?q=one&mode=near")
    assert e.value.code == 500


def test_search_prf_mode(served):
    """mode=prf over HTTP equals engine.search_prf, returns results, and
    ranks at least one doc a plain wand query of the same k misses (the
    expansion is doing work on this corpus) or matches it exactly when
    the corpus has no co-occurring expansion mass — either way the HTTP
    path and the engine API must agree row-for-row."""
    eng, base = served
    q = "babace badi"
    status, body = _get(f"{base}/search?q={q.replace(' ', '+')}&mode=prf&k=5")
    assert status == 200 and body["mode"] == "prf"
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.search_prf(q, k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct and len(got) > 0


def test_mlt_endpoint(served):
    """/mlt?id= returns the engine's more_like_this rows; the seed never
    appears in its own related list."""
    eng, base = served
    seed = int(eng.doc_map.select("doc_id").first()["doc_id"])
    status, body = _get(f"{base}/mlt?id={seed}&k=5")
    assert status == 200 and body["seed"] == seed
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.more_like_this(seed, k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct and len(got) > 0
    assert seed not in {d for d, _ in got}


def test_facets_and_stats_endpoints(served):
    """/facets aggregates the doc-store field over exactly the top-k hit
    set (checked against a direct engine search + pandas count);
    /stats reports corpus scalars + vocab/postings consistent with
    term_stats."""
    eng, base = served
    q = "babace badi"
    status, body = _get(f"{base}/facets?q={q.replace(' ', '+')}&field=role&k=20")
    assert status == 200 and body["field"] == "role"
    hit_ids = [r.doc_id for r in eng.search(q, k=20).collect()]
    roles = {r.doc_id: r.role
             for r in eng.doc_map.filter(
                 eng.doc_map.doc_id.isin(hit_ids)).collect()}
    want: dict[str, int] = {}
    for d in hit_ids:
        want[roles[d]] = want.get(roles[d], 0) + 1
    got = {f["value"]: f["n"] for f in body["facets"]}
    assert got == want and sum(got.values()) == len(hit_ids)

    status, st = _get(f"{base}/stats")
    assert status == 200
    assert st["n_docs"] == eng.scalars.n_docs
    assert st["vocab"] == eng.term_stats.count()
    assert st["layouts"] == ["doc"] and st["n_tombstones"] == 0


def test_search_after_pages_partition_the_ranking(served):
    """Pages fetched via the cursor predicate must exactly tile the
    deep top-k: page1 + page2 (cursor = page1's last row) == top-2k,
    with no overlap and no gap."""
    from pyspark.sql import functions as F

    eng, base = served
    # hottest term -> guaranteed > 20 matching docs (non-vacuous page 2)
    q = eng.term_stats.orderBy(F.desc("df")).first()["term"]
    # the cursor contract is defined on the ROUNDED (6dp) ordering, the
    # same discipline every oracle-gated entry pins
    deep = sorted(
        ((round(float(r.score), 6), int(r.doc_id))
         for r in eng.search(q, k=20, mode="exhaustive").collect()),
        key=lambda t: (-t[0], t[1]))
    page1, want2 = deep[:10], deep[10:20]
    last_score, last_doc = page1[-1]
    p2 = [(round(float(r.score), 6), int(r.doc_id))
          for r in eng.search_after(q, last_score, last_doc,
                                    k=10).collect()]
    assert p2 == want2 and p2
    assert not set(d for _, d in p2) & set(d for _, d in page1)


def test_search_prefix_and_fuzzy_modes(served):
    """mode=prefix (wildcard rewrite) and mode=fuzzy (levenshtein<=2
    rewrite) over HTTP equal the engine API row-for-row; the fuzzy typo
    recovers results even though the literal term is in no document."""
    eng, base = served
    # a real dictionary term to derive the prefix / typo from
    term = eng.term_stats.orderBy("term").filter(
        F.length("term") >= 4).select("term").first()["term"]

    prefix = term[:3]
    status, body = _get(f"{base}/search?q={prefix}&mode=prefix&k=5")
    assert status == 200 and body["mode"] == "prefix"
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.search_wildcard(prefix, k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct and len(got) > 0

    typo = term[:-1] + "zz"  # dist 2 from term, certainly not a real term
    status, body = _get(f"{base}/search?q={typo}&mode=fuzzy&k=5")
    assert status == 200 and body["mode"] == "fuzzy"
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.search_fuzzy(typo, k=5, max_dist=2).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct and len(got) > 0


def test_search_collapse_exact_vs_convs(served):
    """search_collapse (exact grouped top-k) agrees with search_convs
    (WAND over-fetch collapse) on group ranking when the over-fetch
    covers every matching turn — and its group_score is the max member
    score by construction."""
    eng, base = served
    q = "babace badi"
    exact = eng.search_collapse(q, field="conv_id", k=5).collect()
    approx = eng.search_convs(q, k=5, turns_k=10_000).collect()
    assert [(r.group, round(r.group_score, 6), r.best_doc_id)
            for r in exact] == \
        [(r.conv_id, round(r.conv_score, 6), r.best_doc_id)
         for r in approx]


def test_search_lm_and_bm25f_modes(served):
    eng, base = served
    q = "babace badi"
    for mode, direct_fn in (
        ("lm", lambda: eng.search_lm(q, k=5)),
        ("bm25f", lambda: eng.search_bm25f(q, k=5)),
    ):
        status, body = _get(f"{base}/search?q={q.replace(' ', '+')}&k=5&mode={mode}")
        assert status == 200 and body["mode"] == mode
        direct = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in direct_fn().collect()]
        via_http = [(r["doc_id"], round(r["score"], 9))
                    for r in body["results"]]
        assert via_http == direct and direct


def test_sigterms_endpoint(served):
    eng, base = served
    status, body = _get(f"{base}/sigterms?q=bababa&k=20&n=5")
    assert status == 200
    assert body["terms"] and len(body["terms"]) <= 5
    api = eng.significant_terms("bababa", k=20, n_top=5).collect()
    assert [(t["term"], t["fg_df"]) for t in body["terms"]] == \
        [(r.term, r.fg_df) for r in api]


def test_histogram_endpoint(served):
    eng, base = served
    status, body = _get(f"{base}/histogram?q=bababa&k=20&interval=3600")
    assert status == 200
    n_hits = eng.search("bababa", k=20).count()
    assert sum(b["n"] for b in body["buckets"]) == n_hits


def test_msm_mode(served):
    eng, base = served
    status, body = _get(f"{base}/search?q=bababa+dadada&k=5&mode=msm&m=2")
    assert status == 200
    api = eng.search_msm("bababa dadada", min_should_match=2, k=5).collect()
    assert [r["doc_id"] for r in body["results"]] == [r.doc_id for r in api]


def test_explain_endpoint_sums_to_score(served):
    eng, base = served
    hit = eng.search("bababa", k=1, mode="exhaustive").collect()[0]
    status, body = _get(f"{base}/explain?q=bababa&id={hit.doc_id}")
    assert status == 200
    assert body["terms"]
    assert body["score"] == pytest.approx(round(hit.score, 6), abs=2e-6)
    # per-term invariants: tf >= 1, df >= tf's doc, partial > 0
    for t in body["terms"]:
        assert t["tf"] >= 1 and t["df"] >= 1 and t["partial"] > 0


def test_search_stemmed_and_substring_modes(served):
    """mode=stemmed (S-stemmer analyzer) and mode=substring (trigram
    verify) over HTTP equal the engine API; the substring score is the
    occurrence count."""
    eng, base = served
    term = eng.term_stats.orderBy(F.desc("df"), F.asc("term")).select(
        "term").first()["term"]

    plural = term + "s"  # stems back to `term` -> must retrieve
    status, body = _get(f"{base}/search?q={plural}&mode=stemmed&k=5")
    assert status == 200 and body["mode"] == "stemmed"
    direct = [(r.doc_id, round(r.score, 9))
              for r in eng.search_stemmed(plural, k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in body["results"]]
    assert got == direct and len(got) > 0

    needle = term[1:]  # strictly-inside substring of a frequent term
    status, body = _get(f"{base}/search?q={needle}&mode=substring&k=5")
    assert status == 200 and body["mode"] == "substring"
    direct = [(r.doc_id, float(r.occ))
              for r in eng.search_substring(needle, k=5).collect()]
    got = [(r["doc_id"], r["score"]) for r in body["results"]]
    assert got == direct and len(got) > 0


def test_termvectors_via_engine(served):
    """engine.term_vectors returns the stored doc's indexed view; a
    tombstoned doc returns zero rows."""
    eng, _ = served
    tv = {r.term: r for r in eng.term_vectors(0).collect()}
    assert len(tv) > 0
    toks = [r.term for r in eng.doc_map.filter(F.col("doc_id") == 0)
            .select(F.explode("terms").alias("term")).collect()]
    assert set(tv) == set(toks)
    assert all(r.first_pos >= 0 and r.tf >= 1 and r.df >= 1 for r in tv.values())


def test_facetstats_and_tophits_endpoints(served):
    """/facetstats buckets sum to the hit count; /tophits ranks per
    bucket and agrees with the direct engine call; mode=dismax serves."""
    eng, base = served
    status, body = _get(f"{base}/facetstats?q=bababa&by=role&attr=dl&k=20")
    assert status == 200 and body["by"] == "role"
    n_hits = eng.search("bababa", k=20).count()
    assert sum(b["n"] for b in body["buckets"]) == n_hits
    assert all(b["min"] <= b["avg"] <= b["max"]
               for b in body["buckets"] if b["n"])

    status, th = _get(f"{base}/tophits?q=bababa&by=role&m=2&k=20")
    assert status == 200
    api = eng.facet_top_hits("bababa", by="role", per_bucket=2,
                             k=20).collect()
    assert [(h["value"], h["rank"], h["doc_id"]) for h in th["hits"]] == \
        [(r.value, r.rank, r.doc_id) for r in api]
    assert all(h["rank"] <= 2 for h in th["hits"])

    status, dm = _get(f"{base}/search?q=bababa+dadada&k=5&mode=dismax")
    assert status == 200
    direct = eng.search_dis_max("bababa dadada", k=5,
                                tie_breaker=0.3).collect()
    assert [r["doc_id"] for r in dm["results"]] == \
        [r.doc_id for r in direct]
