"""Data-driven skew handling for the blocking join.

The north rule calls for salting hot blocking keys explicitly. detect.py's
``candidate_join`` salts with a FIXED replication factor over a caller-
supplied hot-key list; at 10^12 documents the hot set and the right
replication factor per key are data, not configuration — a country-name
anchor may need 500 salt buckets while a merely-warm surface needs 3.
This module derives the plan from observed counts and applies it:

* ``join_salt_plan`` — per-key estimated join output = n_probe · n_build
  (the actual cost a reducer pays for that key, not either side's count
  alone); keys whose estimate exceeds ``target_rows_per_task`` get
  ``salt_factor = ceil(est / target)``. Two map-side-combinable counts and
  one narrow (key, count) join — never touches the wide rows.
* ``apply_salt_plan`` — the variable-factor generalization of
  detect.candidate_join's salting: probe rows of a planned key scatter to
  ``pmod(hash(entropy), salt_factor)``; the build side replicates that key
  ``salt_factor`` times. Unplanned keys keep salt 0 with no replication.
  Output is row-identical to the plain join (pinned by test); no reducer
  owns more than ~target rows of any key.

The plan frame is small by construction (only keys above the threshold —
at web scale, the Zipf head), so it broadcasts.

Reference anchor: the skew this guards against is XLink's mention_anchors
fan-out (high-frequency anchors, e.g. country names — README.md:32-36's
P(e|m) table head); the reference never meets it because it links one
document at a time in Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_salt_plan(
    probe: DataFrame,
    build: DataFrame,
    key_col: str = "key",
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """(key, n_probe, n_build, est_rows, salt_factor) for skewed join keys.

    ``est_rows = n_probe · n_build`` is that key's share of the join
    output; ``salt_factor = ceil(est_rows / target_rows_per_task)``,
    emitted only where it is ≥ 2 (cold keys need no entry). Pure integer
    arithmetic — ceil as ``(a + t − 1) div t`` — so an independent engine
    reproduces the plan bit-for-bit. Overflow bound: n_probe · n_build
    < 2⁶³ holds through ~3·10⁹ rows per side per key.
    """
    pc = (
        probe.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_probe"))
    )
    bc = (
        build.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_build"))
    )
    t = int(target_rows_per_task)
    return (
        pc.join(bc, "key", "inner")
        .withColumn("est_rows", F.expr("n_probe * n_build"))
        .withColumn(
            "salt_factor",
            F.expr(f"(est_rows + {t} - 1) div {t}").cast("long"),
        )
        .filter(F.col("salt_factor") >= 2)
    )


def apply_salt_plan(
    probe: DataFrame,
    build: DataFrame,
    plan: DataFrame,
    key_col: str = "key",
    probe_entropy: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Inner-join probe ⋈ build on ``key_col`` with per-key variable salting.

    ``plan`` is ``join_salt_plan`` output (or any (key, salt_factor ≥ 2)
    frame). Probe rows of a planned key scatter across its salt buckets by
    ``pmod(hash(*probe_entropy), salt_factor)`` — deterministic, layout-
    independent; the build side replicates planned keys ``salt_factor``
    ways via a sequence explode. The join then includes the salt column, so
    a hot key's work spreads over salt_factor reducers while output equals
    the unsalted join exactly.
    """
    factors = F.broadcast(
        plan.select(F.col(key_col), F.col("salt_factor").cast("int"))
    )
    p = (
        probe.join(factors, key_col, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("salt_factor").isNotNull(),
                F.pmod(F.hash(*probe_entropy), F.col("salt_factor")),
            ).otherwise(F.lit(0)),
        )
        .drop("salt_factor")
    )
    b = (
        build.join(factors, key_col, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("salt_factor"), F.lit(1)) - 1
                )
            ),
        )
        .drop("salt_factor")
    )
    return p.join(b, [key_col, "_salt"], "inner").drop("_salt")
