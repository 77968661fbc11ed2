from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from searchengine_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny(spark):
    from searchengine_spark.sources.synth import tiny_df

    return tiny_df(spark)


@pytest.fixture(scope="session")
def small(spark):
    """~800-turn deterministic corpus for oracle rank-identity tests."""
    from searchengine_spark.sources.synth import transcripts_df

    return transcripts_df(spark, n_convs=200, seed=42, partitions=8)
