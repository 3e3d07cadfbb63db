"""Connected components: known graphs, skew, resume-from-snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlink_spark.operators.cluster import connected_components
from xlink_spark.plans.snapshots import SnapshotStore


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    comp: dict[int, set[int]] = {}
    for r in rows:
        comp.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(s) for s in comp.values()}


def test_cc_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {frozenset({1, 2, 3}), frozenset({10, 11, 12})}


def test_cc_chain_and_selfloop(spark):
    # long chain forces multiple star rounds; self-loops are dropped
    chain = [(i, i + 1) for i in range(30)] + [(5, 5)]
    got = _cc(spark, chain)
    assert got == {frozenset(range(31))}


def test_cc_star_skew(spark):
    # one hub connected to 200 leaves (power-law head) + separate pair
    edges = [(0, i) for i in range(1, 201)] + [(500, 501)]
    got = _cc(spark, edges)
    assert got == {frozenset(range(201)), frozenset({500, 501})}


def test_cc_resume_from_snapshot(spark, tmp_path):
    edges = spark.createDataFrame([(i, i + 1) for i in range(20)], "src long, dst long")
    store = SnapshotStore(str(tmp_path / "cc"))
    full = connected_components(edges, store=store, stage="cc").collect()
    last = store.last_iteration("cc")
    assert last is not None and last[0] >= 1  # several rounds committed
    # simulate a fresh run resuming from the committed snapshots: it must
    # produce the identical assignment without recomputing earlier rounds
    resumed = connected_components(edges, store=store, stage="cc").collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, resumed))
    m = store.manifest("cc", last[0])
    assert "edges" in m["metrics"] and m["rows"] >= 0


def test_snapshot_store_atomicity(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    df = spark.range(5)
    store.commit_table("t", df)
    assert store.has_table("t")
    # a dir without MANIFEST is not a committed snapshot
    import os

    os.makedirs(tmp_path / "s" / "half" / "data", exist_ok=True)
    assert not store.has_table("half")
    got = store.read_table(spark, "t").count()
    assert got == 5


def test_get_or_compute_skips_recompute(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "memo"))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(3)

    a = store.get_or_compute(spark, "stage1", compute)
    b = store.get_or_compute(spark, "stage1", compute)
    assert a.count() == b.count() == 3
    assert len(calls) == 1


def test_manifest_per_partition_lineage(spark, tmp_path):
    """Snapshot manifests record per-partition row counts from the written
    parquet footers (per-partition lineage + counters, no recompute)."""
    from xlink_spark.plans.snapshots import SnapshotStore

    store = SnapshotStore(str(tmp_path / "s"))
    df = spark.range(100).repartition(4)
    m = store.commit_table("t", df)
    assert m["rows"] == 100
    assert m["partitions"] == len(m["partition_rows"]) >= 1
    assert sum(m["partition_rows"].values()) == 100
    assert all(f.endswith(".parquet") for f in m["partition_rows"])


def test_cluster_size_histogram_and_largest(spark):
    """Hand-pinned size distribution + deterministic head-cluster report."""
    from xlink_spark.operators.cluster import (
        cluster_size_histogram,
        connected_components,
        largest_clusters,
    )

    # components: {1,2,3,4} (chain), {10,11}, {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        ["src", "dst"],
    )
    cc = connected_components(edges)
    hist = {r["size"]: r.asDict() for r in cluster_size_histogram(cc).collect()}
    assert hist[4]["n_clusters"] == 1 and hist[4]["n_nodes"] == 4
    assert hist[2]["n_clusters"] == 2 and hist[2]["n_nodes"] == 4
    assert sorted(hist) == [2, 4]

    top = largest_clusters(cc, k=2).collect()
    assert [r["size"] for r in top] == [4, 2]
    # tie at size 2 broken by smallest component id: {10,11} beats {20,21}
    assert top[1]["component"] == 10
