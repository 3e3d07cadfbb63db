"""Blocking-quality metrics: pair completeness + reduction ratio.

The record-linkage literature's two standard blocking diagnostics (the
reference evaluates its end result — F1, MentionParsingEval.py:12-69 — but
never the blocking stage itself; at 10^12 documents the blocking key IS the
pipeline's cost model, so it needs its own gauge):

* **pair completeness (PC)** — of the record pairs that are true matches
  (same cluster label), what fraction lands in the same block? A PC below
  the target F1 bounds the pipeline's recall before any scoring runs.
* **reduction ratio (RR)** — 1 − candidate_pairs / all_pairs: how much of
  the quadratic comparison space the key eliminates.

Scale shape: both metrics are pure functions of GROUP SIZES — candidate
pairs = Σ_b C(n_b,2), true pairs = Σ_e C(n_e,2), co-blocked true pairs =
Σ_(e,b) C(n_(e,b),2) (each record carries exactly one block key, so a true
pair is co-blocked iff both sides share (entity, block)). Three map-side
combinable groupBy-counts over the record set; no pair is ever
materialized, so the metric job is linear in records even when the pair
space is 10^24. Ratios are emitted in exact integer µ-units
(x·10⁶ with integer division) — no float crosses an engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _pairs(col_name: str):
    # C(n, 2) over a bigint column — `div` keeps it bigint-exact end to end
    # (n·(n−1) is always even); a `/` here would route the sums through
    # doubles and drift off the DuckDB integer oracle at large counts.
    return F.expr(f"{col_name} * ({col_name} - 1) div 2")


def blocking_quality(
    records: DataFrame,
    block_col: str = "block",
    label_col: str = "entity_id",
) -> DataFrame:
    """One-row frame of blocking diagnostics over (block, label) records.

    Input: one row per record with its block key and true cluster label
    (both non-null; callers filter first). Output columns:
    ``n_records n_blocks n_entities cand_pairs true_pairs co_blocked_pairs
    pc_micro rr_micro`` — pc = co_blocked/true, rr = 1 − cand/all, both as
    floor(x·10⁶) computed in integer arithmetic.

    Exactness bound: pair counts are C(n,2) bigints, so the µ-unit
    arithmetic is exact while cand_pairs < 2⁶³/10⁶ ≈ 9.2·10¹² — i.e. up to
    ~4·10⁶ records per block / entity. Beyond that, compute the ratios over
    a deterministic hash-sample of records (operators/sampling.py) — the
    metrics are sample-stable because they are ratios of group-size moments.
    """
    r = records.select(
        F.col(block_col).alias("b"), F.col(label_col).alias("e")
    )
    by_block = r.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    by_entity = r.groupBy("e").agg(F.count(F.lit(1)).alias("n"))
    by_both = r.groupBy("b", "e").agg(F.count(F.lit(1)).alias("n"))

    _z = lambda c: F.coalesce(c, F.lit(0))  # empty input ⇒ 0, not NULL
    blocks = by_block.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        _z(F.sum("n")).cast("long").alias("n_records"),
        _z(F.sum(_pairs("n"))).cast("long").alias("cand_pairs"),
    )
    entities = by_entity.agg(
        F.count(F.lit(1)).alias("n_entities"),
        _z(F.sum(_pairs("n"))).cast("long").alias("true_pairs"),
    )
    both = by_both.agg(
        _z(F.sum(_pairs("n"))).cast("long").alias("co_blocked_pairs")
    )
    out = blocks.crossJoin(entities).crossJoin(both)
    return out.select(
        "n_records",
        "n_blocks",
        "n_entities",
        "cand_pairs",
        "true_pairs",
        "co_blocked_pairs",
        F.when(
            F.col("true_pairs") > 0,
            F.expr(f"co_blocked_pairs * {_MICRO} div true_pairs"),
        )
        .otherwise(F.lit(_MICRO))
        .cast("long")
        .alias("pc_micro"),
        F.when(
            F.col("n_records") > 1,
            F.lit(_MICRO)
            - F.expr(
                f"cand_pairs * {_MICRO} div (n_records * (n_records - 1) div 2)"
            ),
        )
        .otherwise(F.lit(_MICRO))
        .cast("long")
        .alias("rr_micro"),
    )
