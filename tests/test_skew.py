"""Pins for the data-driven skew salting (operators/skew)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xlink_spark.operators.skew import apply_salt_plan, join_salt_plan


def _probe(spark):
    # "hot" appears 6×, "warm" 3×, "cold" 1×, "orphan" probe-only
    rows = (
        [(f"d{i}", "hot") for i in range(6)]
        + [(f"d{i}", "warm") for i in range(3)]
        + [("d9", "cold"), ("d10", "orphan")]
    )
    return spark.createDataFrame(rows, ["doc_id", "key"])


def _build(spark):
    # candidates per key; "lonely" is build-only
    rows = (
        [("hot", f"e{i}") for i in range(5)]
        + [("warm", "e0"), ("warm", "e1")]
        + [("cold", "e7"), ("lonely", "e8")]
    )
    return spark.createDataFrame(rows, ["key", "entity"])


def test_join_salt_plan_exact_ceil(spark):
    plan = join_salt_plan(_probe(spark), _build(spark), "key", target_rows_per_task=4)
    got = {r["key"]: r.asDict() for r in plan.collect()}
    # hot: 6·5 = 30 → ceil(30/4) = 8; warm: 3·2 = 6 → ceil(6/4) = 2
    # cold: 1·1 = 1 → factor 1, excluded; orphan/lonely: no match, excluded
    assert set(got) == {"hot", "warm"}
    assert got["hot"]["n_probe"] == 6 and got["hot"]["n_build"] == 5
    assert got["hot"]["est_rows"] == 30 and got["hot"]["salt_factor"] == 8
    assert got["warm"]["est_rows"] == 6 and got["warm"]["salt_factor"] == 2


def test_apply_salt_plan_equals_plain_join(spark):
    probe, build = _probe(spark), _build(spark)
    plan = join_salt_plan(probe, build, "key", target_rows_per_task=4)
    plain = probe.join(build, "key", "inner")
    salted = apply_salt_plan(probe, build, plan, "key", probe_entropy=("doc_id",))
    cols = ["key", "doc_id", "entity"]
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted.select(*cols).collect())
    )
    # empty plan (nothing hot) degrades to the plain join too
    empty = plan.filter(F.lit(False))
    salted0 = apply_salt_plan(probe, build, empty, "key", probe_entropy=("doc_id",))
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted0.select(*cols).collect())
    )


def test_salted_build_replication_matches_plan(spark):
    """Build side replicates each planned key exactly salt_factor times and
    probe rows of a planned key spread across its buckets."""
    probe, build = _probe(spark), _build(spark)
    plan = join_salt_plan(probe, build, "key", target_rows_per_task=4)
    factors = {r["key"]: r["salt_factor"] for r in plan.collect()}

    b = build.join(F.broadcast(plan.select("key", "salt_factor")), "key", "left")
    b = b.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("salt_factor"), F.lit(1)) - 1)
        ),
    )
    counts = {
        (r["key"], r["entity"]): r["n"]
        for r in b.groupBy("key", "entity").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for (key, _), n in counts.items():
        assert n == factors.get(key, 1)

    # probe scatter is deterministic: same entropy ⇒ same bucket on rerun
    salted1 = apply_salt_plan(probe, build, plan, "key").collect()
    salted2 = apply_salt_plan(probe, build, plan, "key").collect()
    assert sorted(map(tuple, salted1)) == sorted(map(tuple, salted2))
