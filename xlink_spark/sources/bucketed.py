"""Bucketed-table storage for co-located joins (shuffle-free blocking).

The blocking join (mention surface_norm ⋈ KB surface_norm) runs on every
linking batch, but the KB side changes rarely. Hash-bucketing BOTH sides on
the blocking key at write time (Spark's `bucketBy` — the same layout
Iceberg's `bucket(N, col)` partition transform produces) lets every
subsequent sort-merge join read co-located buckets directly: zero Exchange
on a bucketed side, so at 100 TB the recurring per-batch shuffle of the KB
(and of any re-read mention table) disappears from the steady-state cost.

`bucketBy` requires the session catalog (`saveAsTable`) — plain
`.parquet(path)` writes no bucket metadata. The bucket count must MATCH on
both sides for a shuffle-free join (Spark does not yet coalesce mismatched
bucket counts); `write_bucketed` defaults both sides through the same
constant so callers fall into the pit of success.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = DEFAULT_BUCKETS,
    sort: bool = True,
    one_file_per_bucket: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``one_file_per_bucket`` repartitions on the bucket key before the write.
    Without it, `bucketBy` fans each of the N input partitions into up to
    `num_buckets` output files — N×B small files at scale (the classic
    bucketed-write small-file explosion). With it, each bucket is exactly one
    file. `sortBy` keeps each bucket file key-ordered (cheap at write, good
    scan locality); note Spark 4 still plans a defensive per-task Sort before
    the merge join — the win this module pins is the absent Exchange, which
    is the term that grows with data size.

    Overwrites any existing table of the same name.
    """
    spark = df.sparkSession
    spark.sql(f"drop table if exists {table}")
    if one_file_per_bucket:
        df = df.repartition(num_buckets, bucket_col)
    w = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (catalog read —
    a path-level `spark.read.parquet` would silently drop the layout and
    reintroduce the shuffle)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts this plans as a sort-merge join with NO
    Exchange on either side (pinned by test); with only one side bucketed,
    only the other side shuffles.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys)


def write_bucketed_dictionary(
    dictionary: DataFrame, table: str, num_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Publish a (mention, parse_from) dictionary snapshot bucketed on the
    blocking key.

    Dedup happens ONCE here, at publish time, so every later linking batch
    can run join-path detection with ``assume_deduped=True`` — the dict
    side then reads straight from its buckets with no Exchange at all (the
    defensive per-batch ``.distinct()`` would otherwise re-shuffle the full
    dictionary every batch). The projection to (mention, parse_from) BEFORE
    the distinct matters: that is the key the detection join assumes unique,
    and any extra payload column would keep full-row duplicates alive.
    """
    from pyspark.sql import functions as F

    write_bucketed(
        dictionary.select(F.col("mention"), F.col("parse_from")).distinct(),
        table,
        "mention",
        num_buckets,
    )


def detect_with_bucketed_dictionary(
    docs_plain: DataFrame,
    table: str,
    max_words: int | None = None,
) -> DataFrame:
    """Join-path mention detection against a published bucketed dictionary.

    Same matches as `operators.detect.detect_mentions_join` (pinned by
    test); the plan difference is the point — the only shuffle left in the
    blocking join is the probe (n-gram) side repartitioning to the
    dictionary's bucket count. At 100 TB the dictionary is the stable,
    repeatedly-joined side, so its per-batch Exchange is the one worth
    deleting.
    """
    from xlink_spark.operators.detect import detect_mentions_join

    spark = docs_plain.sparkSession
    return detect_mentions_join(
        docs_plain,
        read_bucketed(spark, table),
        max_words=max_words,
        assume_deduped=True,
    )
