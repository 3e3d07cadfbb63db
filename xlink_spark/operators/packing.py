"""Sequence packing: fill fixed token budgets for LLM training batches.

Given per-document token counts, assign each document to a pack such that
no pack exceeds ``capacity`` tokens (an oversized single document gets its
own pack — truncation is the tokenizer's job, not the packer's).

Spark shape: packing is inherently sequential, so the unit of sequential
work is the PARTITION — ``repartitionByRange`` on the id gives contiguous,
deterministic, balanced ranges; each partition packs its ids in sorted
order inside one Arrow-batched ``mapInPandas`` pass (state carries across
batches within a partition). Pack ids are globally unique via
``partition_id << 40 | local_pack``. Per-partition greedy wastes at most
one partial pack per partition versus a global sequential fill — at 10^12
docs that is noise, and it is what makes the operator embarrassingly
parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_PACKED = StructType(
    [
        StructField("pack_id", LongType(), False),
        StructField("doc_id", StringType(), False),
        StructField("n_tokens", LongType(), False),
    ]
)


def pack_sequences(
    doc_tokens: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
) -> DataFrame:
    """(doc_id, n_tokens) → (pack_id, doc_id, n_tokens), deterministic.

    Sequential next-fit in id order within range partitions: a document
    that would overflow the open pack closes it and starts the next. Every
    pack satisfies ``total ≤ capacity`` unless it holds exactly one
    oversized document.
    """
    base = (
        doc_tokens.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(count_col).cast("long").alias("n_tokens"),
        )
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local, used = 0, 0
        for pdf in batches:
            rows = []
            for d, n in zip(pdf["doc_id"], pdf["n_tokens"]):
                n = int(n)
                if used > 0 and used + n > capacity:
                    local += 1
                    used = 0
                used += n
                rows.append(((pid << 40) | local, d, n))
            yield pd.DataFrame(rows, columns=["pack_id", "doc_id", "n_tokens"])

    return base.mapInPandas(run, _PACKED)


def pack_summary(packed: DataFrame) -> DataFrame:
    """(pack_id, n_docs, total_tokens) — the training-loader manifest."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )
