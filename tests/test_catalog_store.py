"""Catalog-backed snapshot store: the SAME resume tests, writeTo() backend.

CatalogSnapshotStore is a drop-in for the directory SnapshotStore — these
tests re-run the directory store's resume/idempotency/manifest suite against
catalog tables, so the production swap (Iceberg catalog → atomic
createOrReplace snapshots) is pinned at the interface, not just documented.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlink_spark.operators.cluster import connected_components
from xlink_spark.plans.snapshots import CatalogSnapshotStore


@pytest.fixture(scope="module", autouse=True)
def clean_warehouse(spark):
    """Wipe leftover managed-table locations from previous sessions.

    The in-memory session catalog forgets table METADATA across sessions,
    but the managed locations under spark-warehouse/ persist — a fresh
    session's saveAsTable then fails with LOCATION_ALREADY_EXISTS. A real
    metastore (Hive/Iceberg) keeps metadata and never hits this; for the
    in-memory backend the test suite owns the warehouse and clears it before
    this module's tests create any tables.
    """
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(wh, ignore_errors=True)


def test_commit_read_manifest_metrics_fn(spark):
    store = CatalogSnapshotStore(spark, namespace="t_basic")
    store.commit_table(
        "a", spark.range(7).withColumnRenamed("id", "v"),
        metrics={"static": 1}, metrics_fn=lambda: {"late": 2},
    )
    assert store.has_table("a") and not store.has_table("nope")
    assert store.read_table(spark, "a").count() == 7
    m = store.manifest("a")
    assert m["rows"] == 7 and m["metrics"] == {"static": 1, "late": 2}
    # overwrite commits replace
    store.commit_table("a", spark.range(3).withColumnRenamed("id", "v"))
    assert store.manifest("a")["rows"] == 3


def test_get_or_compute_skips_recompute(spark):
    store = CatalogSnapshotStore(spark, namespace="t_memo")
    calls = []

    def compute():
        calls.append(1)
        return spark.range(4).withColumnRenamed("id", "v")

    a = store.get_or_compute(spark, "stage1", compute)
    b = store.get_or_compute(spark, "stage1", compute)
    assert a.count() == b.count() == 4
    assert len(calls) == 1


def test_iterations_listing_is_manifest_strict(spark):
    store = CatalogSnapshotStore(spark, namespace="t_iter")
    store.commit("links", 0, spark.range(5).withColumnRenamed("id", "v"))
    store.commit("links", 2, spark.range(2).withColumnRenamed("id", "v"))
    # a data table WITHOUT its manifest table is not a committed snapshot
    spark.range(9).withColumnRenamed("id", "v").write.format("parquet").mode(
        "overwrite"
    ).saveAsTable("t_iter_links_iter_00001")
    assert store.iterations("links") == [0, 2]
    k, reader = store.last_iteration("links")
    assert k == 2 and reader(spark).count() == 2
    assert store.read_iterations_union(spark, "links").count() == 7


def test_v1_overwrite_keeps_a_full_copy_at_every_instant(spark, monkeypatch):
    """The staged v1 swap: a crash between dropping the old table and
    renaming the stage in leaves the new data complete in __stage (nothing
    is ever lost mid-overwrite), and the next successful commit sweeps it."""
    store = CatalogSnapshotStore(spark, namespace="t_stage")
    store.commit_table("p", spark.range(5).withColumnRenamed("id", "v"))
    tbl = store._t("p")

    real_sql = spark.sql

    def crashing_sql(q, *a, **kw):
        if q.startswith("ALTER TABLE") and "__stage" in q:
            raise RuntimeError("simulated crash before rename")
        return real_sql(q, *a, **kw)

    monkeypatch.setattr(store.spark, "sql", crashing_sql)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.commit_table("p", spark.range(9).withColumnRenamed("id", "v"))
    monkeypatch.setattr(store.spark, "sql", real_sql)

    # old table dropped mid-swap, but the NEW data is complete in __stage —
    # a full copy exists; the store correctly reports the stage uncommitted
    assert not store.has_table("p")
    assert spark.table(tbl + "__stage").count() == 9
    # the next commit lands and sweeps the stale stage copy
    store.commit_table("p", spark.range(3).withColumnRenamed("id", "v"))
    assert store.read_table(spark, "p").count() == 3
    assert store.manifest("p")["rows"] == 3
    assert not spark.catalog.tableExists(tbl + "__stage")


def test_cc_resume_from_catalog_snapshot(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(20)], "src long, dst long")
    store = CatalogSnapshotStore(spark, namespace="t_cc")
    full = connected_components(edges, store=store, stage="cc").collect()
    last = store.last_iteration("cc")
    assert last is not None and last[0] >= 1
    resumed = connected_components(edges, store=store, stage="cc").collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, resumed))
    m = store.manifest("cc", last[0])
    assert "edges" in m["metrics"] and m["rows"] >= 0


def test_incremental_links_against_catalog(spark):
    """Dictionary build resume + idempotent/gap link batches + all_links —
    the full incremental contract on the catalog backend."""
    from xlink_spark.fixtures.generate import generate_corpus, to_spark
    from xlink_spark.operators.spans import plain_text
    from xlink_spark.plans.incremental import all_links, link_increment
    from xlink_spark.plans.pipeline import build_dictionary

    store = CatalogSnapshotStore(spark, namespace="t_inc")
    corpus = generate_corpus(seed=9, n_docs=60, n_entities=40)
    docs, kb, wemb, eemb, gold = to_spark(spark, corpus)
    plain = docs.select("doc_id", plain_text("spans").alias("text")).cache()
    base_docs = docs.filter(F.col("doc_id") < "d000040")
    newb = plain.filter(F.col("doc_id") >= "d000040").cache()
    d1 = build_dictionary(base_docs, kb, eemb, store=store)
    n1 = d1.mention_anchors.count()
    # stage memoization: poisoned rebuild must reuse catalog snapshots
    d2 = build_dictionary(docs.filter(F.lit(False)), kb, eemb, store=store)
    assert d2.mention_anchors.count() == n1
    first = newb.filter(F.col("doc_id") < "d000050")
    second = newb.filter(F.col("doc_id") >= "d000050")
    n0 = link_increment(store, 0, first, wemb, eemb).count()
    assert n0 > 0
    # idempotent re-run of a committed batch (poisoned input → snapshot)
    assert link_increment(store, 0, first.limit(0), wemb, eemb).count() == n0
    # newer batch 3 first, then the gap batch 2 returns ITS OWN rows
    link_increment(store, 3, first, wemb, eemb)
    got = link_increment(store, 2, second, wemb, eemb)
    ids = {r["doc_id"] for r in got.select("doc_id").distinct().collect()}
    assert ids and all(i >= "d000050" for i in ids)
    assert store.iterations("links") == [0, 2, 3]
    assert (
        all_links(spark, store).count()
        == n0 + got.count() + link_increment(store, 3, first.limit(0), wemb, eemb).count()
    )
