"""Single-node pure-Python oracle re-implementing reference semantics.

Obvious-by-inspection implementation of the whole pipeline (tokenize ->
forward tf -> df/cf -> score -> top-k) used to assert rank-identity of the
Spark engine. Mirrors SearchEngine Engine/Engine/Engine.cs:125-183 for
``mode="reference"`` (incl. the per-term 1000-posting highest-tf cap) and
textbook Okapi BM25 for ``mode="bm25"``. Tie-breaks pinned:
posting cap (tf desc, doc_id asc); final rank (score desc, doc_id asc).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

from searchengine_spark.functions.scoring import (
    REFERENCE_POSTING_CAP,
    bm25_weight_py,
    idf_py,
    reference_weight_py,
)
from searchengine_spark.functions.tokenize import term_counts_py, tokenize_py


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    dl: dict[int, int] = field(default_factory=dict)
    # term -> list[(doc_id, tf)] sorted by doc_id
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    df: dict[str, int] = field(default_factory=dict)
    cf: dict[str, int] = field(default_factory=dict)

    @staticmethod
    def build(rows: list[tuple]) -> "OracleIndex":
        """rows: (conv_id, turn_idx, text). doc_id = rank of (conv_id, turn_idx)."""
        rows = sorted(rows, key=lambda r: (r[0], r[1]))
        idx = OracleIndex()
        post: dict[str, list[tuple[int, int]]] = defaultdict(list)
        total_dl = 0
        for doc_id, (_c, _t, text) in enumerate(rows):
            counts = term_counts_py(text)
            dl = sum(counts.values())
            idx.dl[doc_id] = dl
            total_dl += dl
            for term, tf in counts.items():
                post[term].append((doc_id, tf))
        idx.n_docs = len(rows)
        idx.avgdl = total_dl / len(rows) if rows else 0.0
        for term, plist in post.items():
            plist.sort()
            idx.postings[term] = plist
            idx.df[term] = len(plist)
            idx.cf[term] = sum(tf for _, tf in plist)
        return idx

    def topk(
        self,
        query: str,
        k: int = 10,
        mode: str = "bm25",
        posting_cap: int | None = None,
    ) -> list[tuple[int, float]]:
        qf = Counter(tokenize_py(query))
        scores: dict[int, float] = defaultdict(float)
        for term, q in qf.items():
            plist = self.postings.get(term)
            if not plist:
                continue
            if mode == "reference":
                cap = posting_cap or REFERENCE_POSTING_CAP
                plist = sorted(plist, key=lambda p: (-p[1], p[0]))[:cap]
                for doc_id, tf in plist:
                    scores[doc_id] += q * reference_weight_py(tf, self.cf[term], self.n_docs)
            elif mode == "bm25":
                idf = idf_py(self.df[term], self.n_docs)
                for doc_id, tf in plist:
                    scores[doc_id] += q * bm25_weight_py(
                        tf, self.dl[doc_id], idf, self.avgdl
                    )
            else:
                raise ValueError(mode)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
