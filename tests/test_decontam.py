"""Cross-split contamination vs a pure-Python oracle."""

from __future__ import annotations

import hashlib

import pytest

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.decontam import cross_split_contamination
from searchengine_spark.operators.sampling import BUCKETS


def _bucket(key, salt):
    return int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:8],
               16) % BUCKETS


def _split(key, weights, salt):
    b = _bucket(key, salt)
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        if b < int(round(acc * BUCKETS)):
            return name
    return names[-1]


def _shingles(text, k=3):
    t = tokenize_py(text)
    return {" ".join(t[i:i + k]) for i in range(len(t) - k + 1)}


DOCS = [(i, f"alpha beta gamma delta w{i % 7} epsilon zeta eta theta")
        for i in range(60)]
WEIGHTS = {"train": 0.6, "val": 0.2, "test": 0.2}


def _py_oracle(max_df=None):
    sh = {i: _shingles(t) for i, t in DOCS}
    if max_df is not None:
        from collections import Counter
        df = Counter(s for v in sh.values() for s in v)
        sh = {i: {s for s in v if df[s] <= max_df} for i, v in sh.items()}
    split = {i: _split(i, WEIGHTS, "split-v1") for i, _ in DOCS}
    train = {i for i in split if split[i] == "train"}
    out = {}
    for i in split:
        if split[i] == "train":
            continue
        shared = set()
        tdocs = set()
        for j in train:
            inter = sh[i] & sh[j]
            if inter:
                shared |= inter
                tdocs.add(j)
        if shared:
            out[i] = (split[i], len(shared), len(tdocs))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_contamination_vs_python(spark, docs):
    got = {r.doc_id: (r.split, r.n_shared_shingles, r.n_train_docs)
           for r in cross_split_contamination(
               docs, weights=WEIGHTS).collect()}
    assert got == _py_oracle()
    assert got, "fixture must produce contamination"


def test_max_shingle_df_drops_boilerplate(spark, docs):
    # every doc shares the boilerplate prefix/suffix shingles; a df cap
    # below the corpus size must remove them from the signal
    capped = {r.doc_id: (r.split, r.n_shared_shingles, r.n_train_docs)
              for r in cross_split_contamination(
                  docs, weights=WEIGHTS, max_shingle_df=15).collect()}
    assert capped == _py_oracle(max_df=15)
    full = _py_oracle()
    assert sum(v[1] for v in capped.values()) < sum(
        v[1] for v in full.values())
