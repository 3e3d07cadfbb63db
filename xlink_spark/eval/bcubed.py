"""B-cubed clustering precision / recall / F1 — the record-linkage
community's standard cluster-quality metric (Bagga & Baldwin 1998).

The reference evaluates mention-level micro F1 only
(MentionParsingEval.py:12-69); an entity-resolution engine whose final
product is transitive CLUSTERS (north rule: blocking → pairwise scoring →
transitive clustering) needs the cluster-grain gauge too. Per item i,
B³-precision(i) = |pred(i) ∩ gold(i)| / |pred(i)| and B³-recall(i) swaps
the denominator; the reported numbers are the means over items.

Scale shape — identical to eval/blocking.py: both means are pure functions
of GROUP SIZES. Every item in the (pred=p, gold=g) contingency cell of
size n_pg shares pred-cluster size n_p and gold-cluster size n_g, so

    B³P = (1/N) Σ_cells n_pg² / n_p      B³R = (1/N) Σ_cells n_pg² / n_g

— three map-side-combinable groupBy counts plus two narrow (key, count)
equi-joins; no pair or item-pair is ever materialized, so the job is
linear in records even when clusters hold 10⁶ members.

Exactness: each cell contributes floor(n_pg² · 10⁶ / n_den) in bigint
arithmetic, the contributions are summed, and the mean is one more integer
division — sum-of-floors is the DOCUMENTED semantics, bit-identical on any
engine (no float ever crosses an engine boundary). F1 is the harmonic mean
of the two floored micro values, again in integers. The bigint bound:
n_pg² · 10⁶ < 2⁶³ requires n_pg ≤ ~3·10⁶ items per contingency cell;
beyond that, run over a deterministic hash-sample (operators/sampling.py)
— the metrics are ratios of group-size moments, so they are sample-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def bcubed(
    records: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """One-row frame of B-cubed metrics over (pred, gold) labeled items.

    Input: one row per item with its predicted cluster id and gold cluster
    id (both non-null; callers filter first). Output columns:
    ``n_items n_pred_clusters n_gold_clusters bcubed_p_micro
    bcubed_r_micro bcubed_f_micro`` — all micro values floor(x·10⁶) via
    integer sum-of-floors (see module docstring). Empty input reports the
    vacuous 10⁶ for all three, mirroring eval/blocking.py's convention.
    """
    r = records.select(F.col(pred_col).alias("p"), F.col(gold_col).alias("g"))
    cells = r.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n_pg"))
    preds = r.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    golds = r.groupBy("g").agg(F.count(F.lit(1)).alias("n_g"))
    j = cells.join(preds, "p").join(golds, "g")

    _z = lambda c: F.coalesce(c, F.lit(0))  # empty input ⇒ 0, not NULL
    agg = j.agg(
        _z(F.sum("n_pg")).cast("long").alias("n_items"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        _z(F.sum(F.expr(f"n_pg * n_pg * {_MICRO} div n_p")))
        .cast("long")
        .alias("psum"),
        _z(F.sum(F.expr(f"n_pg * n_pg * {_MICRO} div n_g")))
        .cast("long")
        .alias("rsum"),
    )
    counts = (
        preds.agg(F.count(F.lit(1)).cast("long").alias("n_pred_clusters"))
        .crossJoin(
            golds.agg(F.count(F.lit(1)).cast("long").alias("n_gold_clusters"))
        )
    )
    out = agg.crossJoin(counts).select(
        "n_items",
        "n_pred_clusters",
        "n_gold_clusters",
        F.when(F.col("n_items") > 0, F.expr("psum div n_items"))
        .otherwise(F.lit(_MICRO))
        .cast("long")
        .alias("bcubed_p_micro"),
        F.when(F.col("n_items") > 0, F.expr("rsum div n_items"))
        .otherwise(F.lit(_MICRO))
        .cast("long")
        .alias("bcubed_r_micro"),
    )
    return out.select(
        "*",
        F.when(
            F.col("bcubed_p_micro") + F.col("bcubed_r_micro") > 0,
            F.expr(
                "2 * bcubed_p_micro * bcubed_r_micro"
                " div (bcubed_p_micro + bcubed_r_micro)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bcubed_f_micro"),
    )
