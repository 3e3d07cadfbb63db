from __future__ import annotations

import pytest

from xlink_spark.fixtures.generate import generate_corpus, to_spark
from xlink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="xlink_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module", autouse=True)
def _bound_cache_accumulation():
    """Unpersist everything at each module boundary.

    The suite shares ONE session; cached blocks accumulated across modules
    can fill the storage pool until broadcast reads thrash in
    evictBlocksToFreeSpace (observed as a multi-minute livelock with dozens
    of threads blocked on the UnifiedMemoryManager monitor). Session-scoped
    cached fixtures (sdfs) recompute lazily from local relations — cheap.
    """
    yield
    import pyspark.sql

    active = pyspark.sql.SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(seed=42, n_docs=120, n_entities=60)


@pytest.fixture(scope="session")
def sdfs(spark, corpus):
    """(docs, kb, word_emb, entity_emb, gold) as cached Spark DataFrames."""
    docs, kb, wemb, eemb, gold = to_spark(spark, corpus)
    out = tuple(df.cache() for df in (docs, kb, wemb, eemb, gold))
    for df in out:
        df.count()
    return out
