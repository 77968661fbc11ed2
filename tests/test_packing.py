"""Token-budget packing vs a pure-Python prefix-sum oracle, and the
partition-independence property the two-phase design exists for."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.packing import pack_bins

ROWS = [(i, (i * 37) % 90 + 10) for i in range(200)]  # lengths 10..99
BUDGET = 256


def _py_oracle():
    out = {}
    acc = 0
    for i, ln in sorted(ROWS):
        out[i] = (acc, acc // BUDGET, acc % BUDGET)
        acc += ln
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, n long")


def test_pack_bins_vs_python(spark, docs):
    got = {r.doc_id: (r.start_offset, r.bin_id, r.offset_in_bin)
           for r in pack_bins(docs, BUDGET, "n").collect()}
    assert got == _py_oracle()


def test_pack_bins_partition_independent(spark, docs):
    a = {r.doc_id: (r.start_offset, r.bin_id)
         for r in pack_bins(docs, BUDGET, "n", num_partitions=1).collect()}
    b = {r.doc_id: (r.start_offset, r.bin_id)
         for r in pack_bins(docs.repartition(13), BUDGET, "n",
                            num_partitions=7).collect()}
    assert a == b


def test_pack_bins_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        pack_bins(docs, 0, "n")
