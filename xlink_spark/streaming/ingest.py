"""Structured Streaming operators for incremental corpus processing.

The reference is batch-only (SURVEY §2.10) — its "online" predictor is a
per-document function call. At 10^12-document scale the lake grows
continuously, so the engine exposes the pipeline's stateless stages as
streaming transforms plus the stateful primitives a live ingest needs:

* ``stream_documents``        — file-source stream of document parquet drops
* ``streaming_detect``        — incremental mention detection (stateless
                                mapInPandas works unchanged on streams)
* ``streaming_exact_dedup``   — watermarked dropDuplicates on content hash
* ``streaming_mention_counts``— event-time windowed anchor counting with
                                late-data tolerance (the incremental
                                mention_anchors feed)
* ``running_anchor_totals``   — custom stateful op via
                                applyInPandasWithState: running per-mention
                                totals with per-batch deltas

Checkpointing: every writeStream MUST set ``checkpointLocation`` (callers
pass it) — this is the streaming twin of the snapshot-store resumability.
Tests drive these with Trigger.AvailableNow over temp dirs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def stream_documents(spark, path: str, with_ts: bool = True) -> DataFrame:
    """File-source stream over parquet document drops.

    Schema: (doc_id string, text string) + optional ingest timestamp for
    event-time operators. maxFilesPerTrigger bounds batch size so state
    stores and shuffles stay sized regardless of backlog.
    """
    schema = "doc_id string, text string, event_ts timestamp"
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )
    return s


def streaming_detect(stream_docs: DataFrame, surface_dict: dict) -> DataFrame:
    """Incremental mention detection — the batch scanner verbatim.

    detect_mentions is stateless mapInPandas, so the same code path serves
    batch and streaming (single-codebase guarantee); event_ts rides along as
    a passthrough column (stream-stream joins are restricted by output
    mode, so the detector carries time itself). Conflict resolution
    (windows) is per-doc and rows of one doc arrive in one batch, so the
    batch resolver applies per micro-batch via foreachBatch in the caller.
    """
    from xlink_spark.operators.detect import detect_mentions

    pt = ("event_ts",) if "event_ts" in stream_docs.columns else ()
    return detect_mentions(stream_docs, surface_dict, passthrough=pt)


def streaming_exact_dedup(stream_docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked exact dedup: first sighting of each content hash wins.

    State is bounded by the watermark: a hash unseen for ``watermark`` is
    evicted, so the state store does not grow with the full corpus — the
    standard streaming trade (exactness within the horizon). Full-corpus
    exactness stays a batch job (dedup.exact_duplicates).
    """
    hashed = stream_docs.withColumn("content_hash", F.md5("text"))
    return hashed.withWatermark("event_ts", watermark).dropDuplicates(
        ["content_hash"]
    )


def streaming_mention_counts(
    detected: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed mention counts with late-data tolerance.

    detected must carry ``event_ts`` (streaming_detect passthrough) →
    per-window per-surface counts. Late rows within the watermark update
    their window; older ones drop — the incremental mention_anchors feed.
    """
    return (
        detected.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), F.lower("surface").alias("mention"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("win.start", "win.end", "mention", "cnt")
    )


def streaming_quality_histogram(
    stream_docs: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    bucket_width_u: int = 10_000,
) -> DataFrame:
    """Event-time windowed quality-score histogram — the streaming feed for
    the PSI drift gate (operators/textstats.histogram_drift): each closed
    window's (bucket, n) rows diff against the reference snapshot's
    histogram downstream, so distribution shift in the INGEST stream is
    caught before the batch pipeline retrains thresholds on it.

    Buckets are the same integer µ-unit quantization as the batch side
    (floor(quality·1e6) div bucket_width_u) — stream and batch histograms
    are directly comparable by construction. Per-window per-bucket counts
    are map-side-combinable; state is bounded by windows × buckets, never
    by stream volume.
    """
    from xlink_spark.operators.textstats import quality_score_raw

    bucket = F.expr(
        f"floor(quality_raw * 1000000) div {bucket_width_u}"
    ).cast("long").alias("bucket")
    return (
        stream_docs.withColumn("quality_raw", quality_score_raw("text"))
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), bucket)
        .agg(F.count(F.lit(1)).alias("n"))
        .select("win.start", "win.end", "bucket", "n")
    )


_TOTALS_OUT = StructType(
    [
        StructField("mention", StringType(), False),
        StructField("total", LongType(), False),
        StructField("batch_delta", LongType(), False),
    ]
)
_TOTALS_STATE = StructType([StructField("total", LongType(), False)])


def running_anchor_totals(detected_with_ts: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator: running per-mention totals + batch deltas.

    applyInPandasWithState keyed by mention; state = lifetime count. This is
    the streaming twin of link(m) (A3): the dictionary's link counts stay
    current as the corpus grows without re-scanning history.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        delta = 0
        for pdf in pdfs:
            delta += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += delta
        state.update((total,))
        yield pd.DataFrame(
            {"mention": [key[0]], "total": [total], "batch_delta": [delta]}
        )

    return (
        detected_with_ts.withWatermark("event_ts", watermark)
        .select(F.lower("surface").alias("mention"), "event_ts")
        .groupBy("mention")
        .applyInPandasWithState(
            update,
            outputStructType=_TOTALS_OUT,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drive a stream into an in-memory table (tests / interactive).

    Windowed aggregations in append mode only emit watermark-CLOSED windows;
    complete/update to the memory sink shows current state immediately.
    """
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def run_update_to_parquet(stream_df: DataFrame, checkpoint: str, out_path: str):
    """Drive an update-mode stream (stateful ops) to parquet via
    foreachBatch — the file sink itself only supports append, so each
    micro-batch's updated rows are appended with a batch_id column (a
    changelog; readers take the latest row per key)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def run_to_table(stream_df: DataFrame, checkpoint: str, out_path: str, mode: str = "append"):
    """Drive a stream to parquet with checkpointed exactly-once writes."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def streaming_link(
    stream_docs: DataFrame,
    store,
    word_emb: DataFrame,
    entity_emb: DataFrame,
    checkpoint: str,
    out_path: str,
    cfg=None,
):
    """Continuous linking: each micro-batch runs the FULL batch linking DAG
    against the frozen dictionary and commits as an idempotent snapshot.

    The reference's "online" predictor is a per-document call; the streaming
    twin is foreachBatch → ``link_increment``: the dictionary is loaded once
    from committed snapshots, every micro-batch is linked with the same
    batch semantics (same operators, same thresholds) and committed as
    ``links/iter_<batch_id>`` — a crashed/restarted query re-runs a batch id
    and gets the committed snapshot back (exactly-once per batch id).

    ``stream_docs``: streaming (doc_id, text). Returns the StreamingQuery.
    """
    from xlink_spark.config import DEFAULT
    from xlink_spark.plans.incremental import link_increment, load_dictionary

    cfg = cfg or DEFAULT
    spark = stream_docs.sparkSession
    # load ONCE for the whole query (fails fast if never built); per-batch
    # reloads would re-read every snapshot table each micro-batch
    d = load_dictionary(spark, store)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        links = link_increment(
            store, int(batch_id), batch_df.select("doc_id", "text"),
            word_emb, entity_emb, cfg, dictionary=d,
        )
        links.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return (
        stream_docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
