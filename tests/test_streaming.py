"""Structured Streaming operators, driven with Trigger.AvailableNow."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xlink_spark.streaming import ingest as ST

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id string, text string, event_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
    p = str(tmp_path / "docs_in")
    _write_batch(
        spark,
        p,
        [
            ("d1", "alpha beta here", T0),
            ("d2", "alpha beta here", T0 + dt.timedelta(minutes=1)),  # dup of d1
            ("d3", "gamma only", T0 + dt.timedelta(minutes=2)),
        ],
    )
    return p


def _run(stream_df, tmp_path, name, mode="append"):
    out = str(tmp_path / f"{name}_out")
    chk = str(tmp_path / f"{name}_chk")
    q = ST.run_to_table(stream_df, chk, out, mode=mode)
    q.awaitTermination(120)
    return out


def test_streaming_exact_dedup(spark, tmp_path, doc_stream_dir):
    s = ST.stream_documents(spark, doc_stream_dir)
    out = _run(ST.streaming_exact_dedup(s), tmp_path, "dedup")
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == ["d1", "d3"]  # d2 deduped within watermark


def test_streaming_detect_and_window_counts(spark, tmp_path, doc_stream_dir):
    s = ST.stream_documents(spark, doc_stream_dir)
    detected = ST.streaming_detect(s, {"alpha beta": (2, "ma"), "gamma": (1, "ma")})
    counts = ST.streaming_mention_counts(detected, window="10 minutes")
    # append-mode sinks emit only watermark-closed windows; memory+complete
    # shows the live state, which is what this test asserts
    q = ST.run_to_memory(counts, "win_counts", mode="complete")
    q.awaitTermination(120)
    got = {r["mention"]: r["cnt"] for r in spark.sql("select * from win_counts").collect()}
    assert got == {"alpha beta": 2, "gamma": 1}


def _totals_stream(spark, doc_stream_dir):
    s = ST.stream_documents(spark, doc_stream_dir)
    detected = ST.streaming_detect(s, {"alpha beta": (2, "ma"), "gamma": (1, "ma")})
    return ST.running_anchor_totals(detected)


def test_running_anchor_totals_accumulates_across_batches(spark, tmp_path, doc_stream_dir):
    out = str(tmp_path / "totals_out")
    chk = str(tmp_path / "totals_chk")
    q = ST.run_update_to_parquet(_totals_stream(spark, doc_stream_dir), chk, out)
    q.awaitTermination(120)
    got = {r["mention"]: (r["total"], r["batch_delta"]) for r in spark.read.parquet(out).collect()}
    assert got["alpha beta"] == (2, 2)
    # second drop arrives → SAME checkpoint resumes and state carries forward
    _write_batch(
        spark, doc_stream_dir, [("d4", "alpha beta again", T0 + dt.timedelta(minutes=3))]
    )
    q = ST.run_update_to_parquet(_totals_stream(spark, doc_stream_dir), chk, out)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    latest = max((r for r in rows if r["mention"] == "alpha beta"), key=lambda r: r["total"])
    assert latest["total"] == 3 and latest["batch_delta"] == 1


def test_streaming_link_end_to_end(spark, tmp_path, sdfs):
    """streaming_link: micro-batches run the full linking DAG against the
    frozen dictionary and commit idempotent per-batch snapshots."""
    from xlink_spark.operators.spans import plain_text
    from xlink_spark.plans.pipeline import build_dictionary
    from xlink_spark.plans.snapshots import SnapshotStore

    docs, kb, wemb, eemb, gold = sdfs
    store = SnapshotStore(str(tmp_path / "snaps"))
    build_dictionary(docs, kb, eemb, store=store)

    # stream input: the same corpus as plain text, in one drop
    plain = docs.select("doc_id", plain_text("spans").alias("text"))
    in_dir = str(tmp_path / "stream_in")
    plain.coalesce(1).write.mode("overwrite").parquet(in_dir)
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("text", StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = str(tmp_path / "links_out")
    q = ST.streaming_link(
        stream, store, wemb, eemb, checkpoint=str(tmp_path / "ckpt"), out_path=out
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) >= {"doc_id", "start", "end", "surface", "entity_id", "believe"}
    # the committed snapshot matches the streamed output (idempotent commit)
    snap = store.last_iteration("links")
    assert snap is not None and snap[1](spark).count() == got.count()


def test_streaming_quality_histogram_matches_batch_buckets(spark, tmp_path, doc_stream_dir):
    """The streaming per-window quality histogram quantizes EXACTLY like the
    batch side (floor(quality*1e6) div width), so window rows are directly
    comparable with a reference snapshot histogram in histogram_drift."""
    from pyspark.sql import functions as F

    from xlink_spark.operators.textstats import quality_score_raw

    s = ST.stream_documents(spark, doc_stream_dir)
    hist = ST.streaming_quality_histogram(s, window="10 minutes")
    q = ST.run_to_memory(hist, "q_hist", mode="complete")
    q.awaitTermination(120)
    got = {
        (r["bucket"]): r["n"] for r in spark.sql("select * from q_hist").collect()
    }
    # batch-side reference over the same three docs, same quantization
    batch = (
        spark.read.parquet(doc_stream_dir)
        .withColumn("q", quality_score_raw("text"))
        .select(F.expr("floor(q * 1000000) div 10000").cast("long").alias("bucket"))
        .groupBy("bucket")
        .count()
    )
    want = {r["bucket"]: r["count"] for r in batch.collect()}
    assert got == want and sum(got.values()) == 3
