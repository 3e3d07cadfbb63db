"""Incremental linking: frozen dictionary + per-batch link snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlink_spark.fixtures.generate import generate_corpus, to_spark
from xlink_spark.operators.spans import plain_text
from xlink_spark.plans.incremental import all_links, link_increment, load_dictionary
from xlink_spark.plans.pipeline import build_dictionary, link_corpus
from xlink_spark.plans.snapshots import SnapshotStore


@pytest.fixture(scope="module")
def inc_setup(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("inc")
    store = SnapshotStore(str(tmp / "snap"))
    corpus = generate_corpus(seed=5, n_docs=90, n_entities=50)
    docs, kb, wemb, eemb, gold = [d.cache() for d in to_spark(spark, corpus)]
    plain = docs.select("doc_id", plain_text("spans").alias("text")).cache()
    base = plain.filter(F.col("doc_id") < "d000060")
    newb = plain.filter(F.col("doc_id") >= "d000060").cache()
    base_docs = docs.filter(F.col("doc_id") < "d000060")
    build_dictionary(base_docs, kb, eemb, store=store)
    return store, base, newb, wemb, eemb


def test_load_dictionary_requires_snapshots(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="mention_anchors"):
        load_dictionary(spark, SnapshotStore(str(tmp_path / "empty")))


def test_incremental_batch_matches_full_run(spark, inc_setup):
    store, base, newb, wemb, eemb = inc_setup
    inc = link_increment(store, 0, newb, wemb, eemb)
    d = load_dictionary(spark, store)
    full = link_corpus(newb, d, wemb, eemb)
    key = lambda df: sorted(
        (r["doc_id"], r["start"], r["entity_id"]) for r in df.collect()
    )
    assert key(inc) == key(full)
    assert len(key(inc)) > 0


def test_incremental_rerun_is_idempotent(spark, inc_setup):
    store, base, newb, wemb, eemb = inc_setup
    a = link_increment(store, 0, newb, wemb, eemb).count()
    # poisoned input on re-run of the SAME batch id → snapshot returned
    empty = newb.filter(F.lit(False))
    b = link_increment(store, 0, empty, wemb, eemb).count()
    assert a == b


def test_all_links_unions_batches(spark, inc_setup):
    store, base, newb, wemb, eemb = inc_setup
    first_half = newb.filter(F.col("doc_id") < "d000075")
    second_half = newb.filter(F.col("doc_id") >= "d000075")
    n0 = link_increment(store, 0, newb, wemb, eemb).count()  # cached batch 0
    link_increment(store, 1, second_half, wemb, eemb)
    total = all_links(spark, store).count()
    assert total == n0 + link_increment(store, 1, second_half, wemb, eemb).count()