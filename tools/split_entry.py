"""One-shot refactor tool: split entry_queries.py into per-family modules
under searchengine_spark/entry/, leaving entry_queries.py as the explicit
ordered registry. Run once, review, delete or keep for provenance.
"""

from __future__ import annotations

import re
from pathlib import Path

SRC = Path("/root/repo/searchengine_spark/entry_queries.py")
PKG = Path("/root/repo/searchengine_spark/entry")

lines = SRC.read_text().splitlines(keepends=True)


def grab(a: int, b: int) -> str:
    """1-indexed inclusive slice."""
    return "".join(lines[a - 1 : b]).strip("\n") + "\n"


# (module, [(start, end), ...]) — curated by family; order inside a module
# preserves the original file order so within-module forward references
# keep working.
RANGES = {
    "_shared": [(39, 89), (191, 200)],
    "core": [(93, 190), (201, 494)],
    "dedup": [(498, 782), (1866, 1911), (2103, 2148), (2255, 2308)],
    "similarity": [(786, 977), (2309, 2320), (2504, 2559)],
    "text": [(981, 1392)],
    "media": [(1396, 1513)],
    "events": [(1514, 1532), (1765, 1861), (1912, 1956)],
    "profiling": [(2005, 2102), (2321, 2341), (2560, 2587)],
    "facets": [
        (2342, 2381),
        (2994, 3036),
        (3117, 3165),
        (3258, 3327),
        (3532, 3565),
    ],
    "retrieval": [
        (1533, 1764),
        (1957, 2004),
        (2149, 2254),
        (2382, 2503),
        (2588, 2993),
        (3037, 3116),
        (3166, 3257),
        (3328, 3531),
        (3566, 3680),
    ],
}

DOCSTRINGS = {
    "_shared": "Shared pieces: corpus CTEs, BM25 weight, loaders, query helpers.",
    "core": "Core index queries: stats, postings, BM25/reference top-k, WAND, segments.",
    "dedup": "Dedup family: exact/minhash/simhash/CC/span dedup + the cleaning recipe.",
    "similarity": "Similarity search: cosine/LSH/IVF/PQ ANN, embedding dup pairs, MMR.",
    "text": "Text analysis: transcripts context, LM scores, lang-id, quality, tokens.",
    "media": "Multimodal plumbing: payload meta, decode, resize, frame sampling.",
    "events": "Event analytics: windowed counts, sessionization, as-of, bigrams.",
    "profiling": "Distribution profiling: quantiles, source mix, cardinality, budget.",
    "facets": "Facet aggregations: counts, ranges, histogram, stats, top-hits, percentiles.",
    "retrieval": "Retrieval extras: phrase/NEAR, scorers, rewrite, federation, LTR, rescoring.",
}

bodies = {m: "\n\n".join(grab(a, b) for a, b in rs) for m, rs in RANGES.items()}

# --- symbol index: top-level names defined per module ---
DEF_RE = re.compile(r"^(?:def\s+(\w+)|(\w+(?:\s*,\s*\w+)*)\s*=\s)", re.M)
symbols: dict[str, str] = {}  # name -> module
for mod, body in bodies.items():
    for m in DEF_RE.finditer(body):
        if m.group(1):
            names = [m.group(1)]
        else:
            names = [n.strip() for n in m.group(2).split(",")]
        for n in names:
            if n.isidentifier():
                symbols.setdefault(n, mod)

SHARED = {n for n, m in symbols.items() if m == "_shared"}
SHARED |= {"BM25_K1", "BM25_B"}

OPERATOR_MODULES = ["dedup", "multimodal", "similarity", "textstats"]
SIMPLE_IMPORTS = {
    "minhash_params": "from searchengine_spark.functions.hashing import minhash_params",
    "duckdb_tokens_sql": "from searchengine_spark.functions.tokenize import duckdb_tokens_sql",
    "score_all": "from searchengine_spark.operators.topk import score_all",
}
FORWARD_NAMES = ["CorpusScalars", "build_forward", "build_term_stats", "explode_forward"]

WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def used_words(body: str) -> set[str]:
    return set(WORD_RE.findall(body))


for mod, body in bodies.items():
    words = used_words(body)
    own = {n for n, m in symbols.items() if m == mod}
    header = ["from __future__ import annotations", ""]
    py = []
    if "DataFrame" in words:
        py.append("DataFrame")
    if "SparkSession" in words:
        py.append("SparkSession")
    if "Window" in words:
        py.append("Window")
    if py:
        header.append(f"from pyspark.sql import {', '.join(py)}")
    header.append("from pyspark.sql import functions as F")
    header.append("")
    for name, imp in SIMPLE_IMPORTS.items():
        if name in words:
            header.append(imp)
    ops = [o for o in OPERATOR_MODULES if re.search(rf"\b{o}\.", body)]
    if ops:
        header.append(
            f"from searchengine_spark.operators import {', '.join(ops)}")
    fwd = [n for n in FORWARD_NAMES if n in words]
    if fwd:
        header.append(
            "from searchengine_spark.operators.forward import ("
            + ", ".join(fwd) + ")")
    if mod != "_shared":
        sh = sorted(n for n in SHARED if n in words)
        if sh:
            header.append(
                "from searchengine_spark.entry._shared import ("
                + ", ".join(sh) + ")")
        # cross-family imports (rare, explicit)
        cross: dict[str, list[str]] = {}
        for n in sorted(words):
            m = symbols.get(n)
            if m and m not in (mod, "_shared") and n not in own:
                cross.setdefault(m, []).append(n)
        for m, names in sorted(cross.items()):
            header.append(
                f"from searchengine_spark.entry.{m} import ("
                + ", ".join(names) + ")")
    text = (
        f'"""{DOCSTRINGS[mod]}\n\nSplit out of entry_queries.py (round 5); '
        'the ordered registry lives there.\n"""\n\n'
        + "\n".join(header)
        + "\n\n\n"
        + body
    )
    PKG.mkdir(exist_ok=True)
    (PKG / f"{mod}.py").write_text(text)
    print(f"wrote entry/{mod}.py  ({len(text.splitlines())} lines)")

(PKG / "__init__.py").write_text(
    '"""Per-family (Spark, DuckDB-oracle) query definition modules.\n\n'
    "The single ordered registry — load-bearing for the driver's prefix\n"
    "correctness gate — lives in searchengine_spark.entry_queries.\n"
    '"""\n'
)

# --- registry rewrite: qualify the dict bodies ---
full = SRC.read_text()
aq = re.search(r"def all_queries\(\).*?return \{(.*?)\n    \}", full, re.S)
ao = re.search(r"def all_oracle_sql\(.*?return \{(.*?)\n    \}", full, re.S)
assert aq and ao


def qualify(expr: str) -> str:
    def sub(m):
        n = m.group(0)
        mod = symbols.get(n)
        if mod == "_shared":
            return f"_shared.{n}"
        return f"{mod}.{n}" if mod else n

    return WORD_RE.sub(sub, expr)


ENTRY_RE = re.compile(r'"(\w+)":\s*(.+?),\s*$', re.M)
entries = [(m.group(1), qualify(m.group(2).strip()))
           for m in ENTRY_RE.finditer(aq.group(1))]
oracle_entries = [(m.group(1), qualify(m.group(2).strip()))
                  for m in ENTRY_RE.finditer(ao.group(1))]

reg_lines = "\n".join(f'    ("{n}", {e}),' for n, e in entries)
ora_lines = "\n".join(f'        "{n}": {e},' for n, e in oracle_entries)

NEW = f'''"""Ordered registry of paired (Spark DataFrame callable, DuckDB oracle SQL)
query definitions for the driver correctness gate (`__spark_entry__.py`).

The definitions live in per-family modules under
``searchengine_spark/entry/`` ({", ".join(sorted(m for m in RANGES if m != "_shared"))});
this file holds ONLY the explicit ordered registry.

ORDER IS LOAD-BEARING: the driver's correctness gate checks a PREFIX of
this list (50 names per round), so never-yet-driver-attested and
just-modified operators come FIRST; names already green in a driver
CORRECTNESS record sit past the window (all still verifiable any time
with tools/check_entry.py). tests/test_entry_contract.py pins the exact
name order — a mid-round insertion into the window is a test failure,
not a silent gate change.

Cross-engine float discipline (see entry/_shared.py): every float column
is ``round(x, 6)`` on BOTH sides, and any ordering/limit is applied on
the ROUNDED value with doc-id tie-breaks, so value-hashes match
bit-for-bit. Integer aggregates are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.entry import (
    _shared,
    core,
    dedup,
    events,
    facets,
    media,
    profiling,
    retrieval,
    similarity,
    text,
)

# backwards-compatible re-exports (external callers: __spark_entry__,
# bench.py, tests)
_bm25_topk = core._bm25_topk
_bm25_topk_sql = core._bm25_topk_sql
_docs = _shared._docs
BASE_CTES = _shared.BASE_CTES
q_clean_corpus = dedup.q_clean_corpus
q_federated_wand_topk = retrieval.q_federated_wand_topk

#: The ordered registry. The first ~50 names are the current round's
#: correctness-gate window (see module docstring).
REGISTRY: tuple[tuple[str, Callable[[SparkSession, str], DataFrame]], ...] = (
{reg_lines}
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(REGISTRY)


def all_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    return {{
{ora_lines}
    }}
'''

SRC.write_text(NEW)
print(f"rewrote entry_queries.py ({len(NEW.splitlines())} lines, "
      f"{len(entries)} registry entries, {len(oracle_entries)} oracles)")
