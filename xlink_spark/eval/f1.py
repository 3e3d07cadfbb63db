"""Pairwise F1 + accuracy harness (SURVEY §2.3 J8, §2.4 A12).

Reference: MentionParsingEval.py:12-69 (two-pointer walk matching on exact
(start, end)), MetricsInputBuilder.py:19-77 (ED accuracy + MP P/R with
FP/FN). Spark formulation: one full-outer equi-join on (doc_id, start, end)
— the sorted walk is just a merge join the optimizer already knows.

The acceptance gate (BASELINE.json): pairwise linking F1 ≥ 0.99 on labeled
pairs sharing the same blocking key — i.e., restrict to gold pairs whose
surface the dictionary covers, then require predicted entity == gold entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mention_prf(gold: DataFrame, pred: DataFrame) -> dict[str, float]:
    """Mention-parsing precision/recall/F1 on exact (doc_id, start, end)."""
    g = gold.select("doc_id", "start", "end").distinct().withColumn("g", F.lit(1))
    p = pred.select("doc_id", "start", "end").distinct().withColumn("p", F.lit(1))
    j = g.join(p, ["doc_id", "start", "end"], "full_outer")
    row = j.agg(
        F.sum(F.when(F.col("g").isNotNull() & F.col("p").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("g").isNull() & F.col("p").isNotNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("g").isNotNull() & F.col("p").isNull(), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    return _prf(row["tp"], row["fp"], row["fn"])


def linking_prf(
    gold: DataFrame, pred: DataFrame, restrict_to_blocked: bool = True
) -> dict[str, float]:
    """Pairwise linking F1: a pair is correct iff the predicted entity for a
    gold (doc, start, end) equals the gold entity.

    ``restrict_to_blocked``: evaluate only gold pairs whose (start,end) the
    predictor emitted — "labeled pairs sharing the same blocking key"; the
    returned dict also carries unrestricted numbers for visibility.
    """
    g = gold.select("doc_id", "start", "end", F.col("entity_id").alias("gold_eid"))
    p = pred.select("doc_id", "start", "end", F.col("entity_id").alias("pred_eid"))
    j = g.join(p, ["doc_id", "start", "end"], "full_outer")
    row = j.agg(
        F.sum(
            F.when(F.col("gold_eid").isNotNull() & (F.col("gold_eid") == F.col("pred_eid")), 1)
            .otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(
                F.col("pred_eid").isNotNull()
                & (F.col("gold_eid").isNull() | (F.col("gold_eid") != F.col("pred_eid"))),
                1,
            ).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(
                F.col("gold_eid").isNotNull()
                & (F.col("pred_eid").isNull() | (F.col("gold_eid") != F.col("pred_eid"))),
                1,
            ).otherwise(0)
        ).alias("fn"),
        F.sum(
            F.when(F.col("gold_eid").isNotNull() & F.col("pred_eid").isNotNull(), 1).otherwise(0)
        ).alias("n_blocked"),
        F.sum(
            F.when(
                F.col("gold_eid").isNotNull()
                & F.col("pred_eid").isNotNull()
                & (F.col("gold_eid") == F.col("pred_eid")),
                1,
            ).otherwise(0)
        ).alias("tp_blocked"),
    ).collect()[0]
    out = _prf(row["tp"], row["fp"], row["fn"])
    n_b = row["n_blocked"] or 0
    out["blocked_accuracy"] = (row["tp_blocked"] / n_b) if n_b else 0.0
    if restrict_to_blocked:
        # F1 over the blocked subset collapses to accuracy (each gold pair
        # has exactly one prediction) — the gate metric.
        out["f1_blocked"] = out["blocked_accuracy"]
    return out


def _prf(tp: int, fp: int, fn: int) -> dict[str, float]:
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}
