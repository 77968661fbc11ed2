"""HTTP serving loop over a loaded SearchEngine — the reference Engine's
long-lived server analog.

Reference: ``Engine.Main`` starts an ``HttpListener``, hands each request
context to a worker sink, parses ``query["query"]``, runs ``Search`` and
renders results (SearchEngine Engine/Engine/Engine.cs:32-96). Here the
same lifecycle is a stdlib ``ThreadingHTTPServer`` in front of
``engine.SearchEngine`` (load once, serve many):

    GET /search?q=words&k=10[&mode=wand|term|exhaustive|reference|
                              phrase|near|prf|prefix|fuzzy|regex|
                              lm|bm25f|dismax|msm][&w=5][&m=2][&snippets=1]
        (mode=phrase: q is an exact phrase; mode=near: q is two terms,
         w the token window; mode=prefix: q is a term prefix, wildcard
         rewrite; mode=fuzzy: q is a single term, levenshtein<=2 rewrite;
         mode=regex: q is a term regex, df-ranked capped rewrite;
         mode=lm: Dirichlet query likelihood; mode=bm25f: true BM25F
         over the title/body token-window split; mode=msm: rank only
         docs matching >= m distinct query terms)
        -> {"query": ..., "k": ..., "took_ms": ..., "results":
            [{"doc_id": ..., "score": ...}, ...]}
    GET /doc?id=123      -> the doc-store row (text + turn metadata)
    GET /suggest?prefix=re&k=5   -> autocomplete over the lexicon
    GET /suggest?term=sprak&k=5  -> did-you-mean (levenshtein <= 2)
    GET /explain?q=words&id=123  -> per-term score breakdown (ES _explain)
    GET /sigterms?q=words&k=100&n=10 -> JLH significant terms of the hit set
    GET /histogram?q=words&interval=3600 -> date-histogram facet of the hits
    GET /facetstats?q=words&by=role&attr=dl -> terms+stats sub-agg of hits
    GET /tophits?q=words&by=role&m=3 -> terms+top_hits sub-agg of hits
    GET /healthz         -> {"status": "ok", "n_docs": N}

Spark's driver is single-process, so request handlers serialize their
Spark actions through one session — matching the reference, where every
request ultimately reads the same mmapped files. Production serving at
cluster scale would front many driver replicas; this module is the
single-node lifecycle (and the test surface for it).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from searchengine_spark.engine import SearchEngine

_MODES = {"wand", "term", "exhaustive", "reference", "phrase", "near",
          "prf", "prefix", "fuzzy", "regex", "lm", "bm25f", "dismax",
          "msm", "stemmed", "substring"}


def _run_search(engine: SearchEngine, q: str, k: int, mode: str,
                window: int, msm: int = 2):
    """Dispatch one /search request to the engine method for ``mode``
    (phrase/near are positional plans over the doc store; the rest are
    posting-list plans). mode=msm takes ``&m=`` as min_should_match."""
    if mode == "prf":
        return engine.search_prf(q, k=k)
    if mode == "msm":
        return engine.search_msm(q, min_should_match=msm, k=k)
    if mode == "prefix":
        return engine.search_wildcard(q, k=k)
    if mode == "fuzzy":
        return engine.search_fuzzy(q, k=k, max_dist=2)
    if mode == "regex":
        return engine.search_regex(q, k=k)
    if mode == "lm":
        return engine.search_lm(q, k=k)
    if mode == "bm25f":
        return engine.search_bm25f(q, k=k)
    if mode == "dismax":
        return engine.search_dis_max(q, k=k, tie_breaker=0.3)
    if mode == "stemmed":
        return engine.search_stemmed(q, k=k)
    if mode == "substring":
        from pyspark.sql import functions as F

        return engine.search_substring(q, k=k).select(
            "doc_id", F.col("occ").cast("double").alias("score"))
    if mode == "phrase":
        return engine.search_phrase(q, k=k)
    if mode == "near":
        terms = q.split()
        if len(terms) != 2:
            raise ValueError("mode=near needs exactly two terms in q")
        return engine.search_near(terms[0], terms[1], window=window, k=k)
    return engine.search(q, k=k, mode=mode)


def _json_bytes(obj) -> bytes:
    return json.dumps(obj).encode("utf-8")


def make_handler(engine: SearchEngine, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test runs
            pass

        def _reply(self, code: int, obj) -> None:
            body = _json_bytes(obj)
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            try:
                if url.path == "/healthz":
                    self._reply(200, {"status": "ok",
                                      "n_docs": engine.scalars.n_docs})
                elif url.path == "/search":
                    q = (qs.get("q") or qs.get("query") or [""])[0]
                    k = int((qs.get("k") or ["10"])[0])
                    mode = (qs.get("mode") or ["wand"])[0]
                    if mode not in _MODES:
                        self._reply(400, {"error": f"unknown mode {mode!r}"})
                        return
                    want_snip = (qs.get("snippets") or ["0"])[0] == "1"
                    window = int((qs.get("w") or ["5"])[0])
                    msm = int((qs.get("m") or ["2"])[0])
                    t0 = time.perf_counter()
                    with lock:  # one Spark action at a time (driver JVM)
                        if want_snip:
                            from searchengine_spark.operators.snippets import (
                                first_snippet,
                            )
                            from pyspark.sql import functions as F

                            topk = _run_search(engine, q, k, mode, window,
                                               msm)
                            joined = engine.doc_map.select(
                                "doc_id", "text").join(
                                F.broadcast(topk), "doc_id")
                            rows = (first_snippet(joined, q)
                                    .orderBy(F.desc("score"),
                                             F.asc("doc_id")).collect())
                        else:
                            rows = _run_search(engine, q, k, mode,
                                               window, msm).collect()
                    self._reply(200, {
                        "query": q, "k": k, "mode": mode,
                        "took_ms": round((time.perf_counter() - t0) * 1e3, 1),
                        "results": [
                            {"doc_id": int(r["doc_id"]),
                             "score": float(r["score"]),
                             **({"snippet": r["snippet"]}
                                if want_snip else {})}
                            for r in rows
                        ],
                    })
                elif url.path == "/facets":
                    q = (qs.get("q") or [""])[0]
                    field = (qs.get("field") or ["role"])[0]
                    k = int((qs.get("k") or ["100"])[0])
                    with lock:
                        rows = engine.search_facets(q, field=field,
                                                    k=k).collect()
                    self._reply(200, {
                        "query": q, "field": field, "k": k,
                        "facets": [{"value": r["value"], "n": int(r["n"])}
                                   for r in rows],
                    })
                elif url.path == "/facetstats":
                    q = (qs.get("q") or [""])[0]
                    by = (qs.get("by") or ["role"])[0]
                    attr = (qs.get("attr") or ["dl"])[0]
                    k = int((qs.get("k") or ["100"])[0])
                    with lock:
                        rows = engine.facet_stats(q, by=by, attr=attr,
                                                  k=k).collect()
                    self._reply(200, {
                        "query": q, "by": by, "attr": attr, "k": k,
                        "buckets": [
                            {"value": r["value"], "n": int(r["n"]),
                             "min": r["min_v"], "max": r["max_v"],
                             "avg": r["avg_v"], "sum": r["sum_v"]}
                            for r in rows],
                    })
                elif url.path == "/tophits":
                    q = (qs.get("q") or [""])[0]
                    by = (qs.get("by") or ["role"])[0]
                    m = int((qs.get("m") or ["3"])[0])
                    k = int((qs.get("k") or ["100"])[0])
                    with lock:
                        rows = engine.facet_top_hits(
                            q, by=by, per_bucket=m, k=k).collect()
                    self._reply(200, {
                        "query": q, "by": by, "per_bucket": m, "k": k,
                        "hits": [{"value": r["value"], "rank": int(r["rank"]),
                                  "doc_id": int(r["doc_id"]),
                                  "score": float(r["score"])}
                                 for r in rows],
                    })
                elif url.path == "/sigterms":
                    q = (qs.get("q") or [""])[0]
                    k = int((qs.get("k") or ["100"])[0])
                    n_top = int((qs.get("n") or ["10"])[0])
                    with lock:
                        rows = engine.significant_terms(
                            q, k=k, n_top=n_top).collect()
                    self._reply(200, {
                        "query": q, "k": k,
                        "terms": [{"term": r["term"], "fg_df": int(r["fg_df"]),
                                   "df": int(r["df"]),
                                   "score": float(r["score"])}
                                  for r in rows],
                    })
                elif url.path == "/histogram":
                    q = (qs.get("q") or [""])[0]
                    k = int((qs.get("k") or ["100"])[0])
                    interval = float((qs.get("interval") or ["3600"])[0])
                    with lock:
                        rows = engine.facet_histogram(q, interval,
                                                      k=k).collect()
                    self._reply(200, {
                        "query": q, "k": k, "interval_s": interval,
                        "buckets": [
                            {"bucket": (int(r["bucket"])
                                        if r["bucket"] is not None else None),
                             "bucket_start": (float(r["bucket_start"])
                                              if r["bucket_start"] is not None
                                              else None),
                             "n": int(r["n"])}
                            for r in rows],
                    })
                elif url.path == "/explain":
                    q = (qs.get("q") or [""])[0]
                    doc_id = int((qs.get("id") or ["-1"])[0])
                    with lock:
                        rows = engine.explain(q, doc_id).collect()
                    self._reply(200, {
                        "query": q, "doc_id": doc_id,
                        "score": round(sum(r["partial"] for r in rows), 6),
                        "terms": [{"term": r["term"], "qf": int(r["qf"]),
                                   "tf": int(r["tf"]), "df": int(r["df"]),
                                   "dl": int(r["dl"]),
                                   "partial": float(r["partial"])}
                                  for r in rows],
                    })
                elif url.path == "/stats":
                    with lock:
                        self._reply(200, engine.index_stats())
                elif url.path == "/mlt":
                    doc_id = int((qs.get("id") or ["-1"])[0])
                    k = int((qs.get("k") or ["10"])[0])
                    t0 = time.perf_counter()
                    with lock:
                        rows = engine.more_like_this(doc_id, k=k).collect()
                    self._reply(200, {
                        "seed": doc_id, "k": k,
                        "took_ms": round((time.perf_counter() - t0) * 1e3, 1),
                        "results": [{"doc_id": int(r["doc_id"]),
                                     "score": float(r["score"])}
                                    for r in rows],
                    })
                elif url.path == "/doc":
                    doc_id = int((qs.get("id") or ["-1"])[0])
                    with lock:
                        rows = engine.fetch([doc_id]).collect()
                    if not rows:
                        self._reply(404, {"error": "not found"})
                        return
                    r = rows[0].asDict()
                    self._reply(200, {
                        k: (v if isinstance(v, (int, float, str, type(None)))
                            else str(v))
                        for k, v in r.items()
                        if k in ("doc_id", "conv_id", "turn_idx", "role",
                                 "ts", "text", "dl")
                    })
                elif url.path == "/suggest":
                    from searchengine_spark.operators.lexicon import (
                        did_you_mean,
                        suggest_prefix,
                    )

                    prefix = (qs.get("prefix") or [None])[0]
                    term = (qs.get("term") or [None])[0]
                    k = int((qs.get("k") or ["5"])[0])
                    if (prefix is None) == (term is None):
                        self._reply(400, {"error":
                                          "pass exactly one of prefix|term"})
                        return
                    with lock:
                        if prefix is not None:
                            rows = suggest_prefix(engine.term_stats,
                                                  prefix, k=k).collect()
                            out = [{"term": r["term"], "df": int(r["df"])}
                                   for r in rows]
                        else:
                            rows = did_you_mean(engine.term_stats,
                                                term, k=k).collect()
                            out = [{"term": r["term"], "dist": int(r["dist"]),
                                    "df": int(r["df"])} for r in rows]
                    self._reply(200, {"suggestions": out})
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # surface errors as JSON, keep serving
                self._reply(500, {"error": str(e)})

    return Handler


class EngineServer:
    """Owns the HTTP listener thread; ``with EngineServer(engine) as srv:``
    for tests, ``serve_forever()`` for a foreground server."""

    def __init__(self, engine: SearchEngine, host: str = "127.0.0.1",
                 port: int = 0):
        self._lock = threading.Lock()
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(engine, self._lock)
        )
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> "EngineServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "EngineServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def serve(spark, index_dir: str, host: str = "0.0.0.0", port: int = 8080) -> None:
    """Foreground entry: load the index and serve until interrupted."""
    engine = SearchEngine.load(spark, index_dir)
    srv = EngineServer(engine, host=host, port=port)
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        srv.stop()
