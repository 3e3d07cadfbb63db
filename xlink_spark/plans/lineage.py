"""Per-partition lineage + metrics via DataFrame.observe (SURVEY §4).

The reference prints progress counters every 1e5/1e6 lines
(extract_mention_anchors.py:20). The Spark-native equivalent is
``DataFrame.observe``: named aggregates evaluated as the job runs, surfaced
through a QueryExecutionListener-free pull API here (collected observation
maps), recorded into snapshot manifests. Quarantine accounting mirrors the
reference's ``error_no`` counter (prepare_standard_input.py:349-398).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a row/partition observation to a DataFrame.

    Returns (df', observation). After an action runs on df', observation.get
    yields {'rows': n, 'partitions': k} without a second pass.
    """
    obs = Observation(name)
    # note: spark_partition_id() is not evaluable inside observe()
    # aggregates (nondeterministic-expression init); partition counts are
    # recorded by the snapshot store from rdd.getNumPartitions instead.
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    return out, obs


def quarantine_split(
    df: DataFrame, predicate, name: str = "quarantine"
) -> tuple[DataFrame, DataFrame, Observation]:
    """Split valid/invalid rows with counted rejects (error_no semantics).

    Returns (valid, invalid, observation-on-valid). The invalid side is a
    real DataFrame (persistable for audit), not just a counter — at 100 TB
    you want the quarantined rows, not only their count.
    """
    valid = df.filter(predicate)
    invalid = df.filter(~predicate)
    valid_obs, obs = observed(valid, name)
    return valid_obs, invalid, obs
