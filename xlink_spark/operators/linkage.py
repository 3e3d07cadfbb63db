"""Classic record-linkage operators: sorted-neighborhood blocking and
Fellegi-Sunter match weighting.

The reference links mentions to a KB with exact dictionary probes
(MentionParser.py:53-68) and a fixed fusion formula (xlink.py:147-176).
A record-linkage deployment of the same engine needs the two textbook
components the reference never had:

* ``sorted_neighborhood_pairs`` — Hernandez & Stolfo's sorted-neighborhood
  method: records sorted by a blocking key, candidate pairs = records
  within a sliding window of ``window`` positions. The global rank is
  computed WITHOUT a global window: per-key counts (map-combinable)
  → cumulative offsets at KEY grain (the bounded-cardinality sort key —
  normalized name/zip/phone-prefix — is the method's own assumption)
  → broadcast back → within-key row_number. Pair generation is then a
  banded equi-join on ``rank div (window-1)`` (each left row probes its
  own and the next band), so no rank-adjacency ever becomes a cross join
  and only narrow (id, rank) rows ride the shuffle.

* ``match_weights`` — Fellegi-Sunter m/u estimation from labeled
  comparison vectors: m_k = P(field k agrees | match), u_k = P(agrees |
  non-match), as EXACT bigint count ratios with Laplace smoothing.
  Agreement/disagreement weights are ln of a ratio of two exact bigint
  products, floored to micro-units — the single float step, margin-
  measured before any oracle ships (the PSI/BM25/relatedness precedent).

* ``fs_score`` — per-pair linkage score Σ_k (agree_k ? w_agree_k :
  w_disagree_k) in exact bigint micro-units: the comparison vectors melt
  to narrow (pair, field, agree) rows, join the broadcast per-field
  weight table, and sum — order-independent, bit-stable across engines
  and partitionings.

Scale shape (10^12 records): the SNM key table is the only single-
partition window and it is KEY-grain; the banded self-join fans out at
most ``window`` rows per record; FS weights are a constant-size broadcast
and the melt is n_fields× of a narrow id+bool row. Text never rides any
of these shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def global_sort_ranks(
    records: DataFrame,
    key_col: str,
    order_cols: list[str],
    id_col: str,
) -> DataFrame:
    """1-based global rank over (key, *order_cols, id) without a global
    window: cumulative per-key offsets (KEY-grain single-partition window
    over the small distinct-key table) + within-key row_number. The id
    column must be unique so the order is total and the rank exact."""
    cnt = records.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    kw = (
        Window.orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnt.select(
        key_col, F.coalesce(F.sum("_n").over(kw), F.lit(0)).alias("_off")
    )
    iw = Window.partitionBy(key_col).orderBy(
        *[F.col(c).asc() for c in order_cols], F.col(id_col).asc()
    )
    return (
        records.join(F.broadcast(offs), key_col)
        .withColumn("rank", (F.col("_off") + F.row_number().over(iw)).cast("long"))
        .drop("_off")
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_col: str,
    order_cols: list[str],
    id_col: str,
    *,
    window: int = 5,
) -> DataFrame:
    """Candidate pairs within ``window`` positions of the global sort order
    (max rank distance = window - 1). Returns (id_a, id_b, rank_a, rank_b,
    dist) with rank_a < rank_b; each qualifying pair emitted exactly once
    (the left row probes its own band and the next — a right row's band
    matches exactly one probe)."""
    if window < 2:
        raise ValueError("window must be >= 2 (a window of 1 yields no pairs)")
    w = int(window) - 1
    ranked = global_sort_ranks(records, key_col, order_cols, id_col).select(
        F.col(id_col).alias("_id"), "rank"
    )
    band = F.expr(f"rank div {w}")  # integer div: exact at any rank
    left = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(F.array(band, band + 1)).alias("_band"),
    )
    right = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("rank").alias("rank_b"),
        band.alias("_band"),
    )
    return (
        left.join(right, "_band")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") <= F.lit(w))
        )
        .select(
            "id_a",
            "id_b",
            "rank_a",
            "rank_b",
            (F.col("rank_b") - F.col("rank_a")).alias("dist"),
        )
    )


def match_weights(
    vectors: DataFrame,
    field_cols: list[str],
    label_col: str,
    *,
    smoothing: int = 1,
) -> DataFrame:
    """Fellegi-Sunter per-field weights from labeled comparison vectors.

    ``vectors``: one row per labeled pair with boolean ``field_cols``
    (field agrees?) and boolean ``label_col`` (true match?). Returns one
    row per field: exact bigint numerators/denominators of the smoothed
    m_k and u_k (m_num = Σ(agree ∧ match) + s, m_den = Σ(match) + 2s,
    likewise u over non-matches) plus

        w_agree_micro    = floor(1e6 · ln((m_num·u_den) / (u_num·m_den)))
        w_disagree_micro = floor(1e6 · ln(((m_den−m_num)·u_den)
                                          / ((u_den−u_num)·m_den)))

    — each ln takes ONE double division of two exact bigint products, so
    cross-engine divergence is bounded by ln()'s ulp and the floor margins
    are measurable per dataset. ``smoothing`` must be ≥ 1 so no count is
    ever zero and both logs stay finite."""
    if smoothing < 1:
        raise ValueError("smoothing must be >= 1 (keeps m/u strictly inside (0,1))")
    s = int(smoothing)
    lbl = F.col(label_col).cast("boolean")
    aggs = [
        F.sum(F.when(lbl, 1).otherwise(0)).cast("long").alias("_n_match"),
        F.sum(F.when(~lbl, 1).otherwise(0)).cast("long").alias("_n_non"),
    ]
    for f in field_cols:
        ag = F.col(f).cast("boolean")
        aggs.append(
            F.sum(F.when(lbl & ag, 1).otherwise(0)).cast("long").alias(f"_ma_{f}")
        )
        aggs.append(
            F.sum(F.when((~lbl) & ag, 1).otherwise(0)).cast("long").alias(f"_ua_{f}")
        )
    one = vectors.agg(*aggs)
    stack_args = ", ".join(
        f"'{f}', _ma_{f}, _ua_{f}" for f in field_cols
    )
    long = one.selectExpr(
        "_n_match",
        "_n_non",
        f"stack({len(field_cols)}, {stack_args}) as (field, _ma, _ua)",
    )
    m_num = F.col("_ma") + F.lit(s)
    m_den = F.col("_n_match") + F.lit(2 * s)
    u_num = F.col("_ua") + F.lit(s)
    u_den = F.col("_n_non") + F.lit(2 * s)

    def _w(num_l, num_r, den_l, den_r):
        ratio = (num_l * num_r).cast("double") / (den_l * den_r).cast("double")
        return F.floor(F.lit(float(MICRO)) * F.log(ratio)).cast("long")

    return long.select(
        "field",
        m_num.cast("long").alias("m_num"),
        m_den.cast("long").alias("m_den"),
        u_num.cast("long").alias("u_num"),
        u_den.cast("long").alias("u_den"),
        _w(m_num, u_den, u_num, m_den).alias("w_agree_micro"),
        _w(m_den - m_num, u_den, u_den - u_num, m_den).alias(
            "w_disagree_micro"
        ),
    )


def fs_score(
    vectors: DataFrame,
    weights: DataFrame,
    field_cols: list[str],
    id_cols: list[str],
) -> DataFrame:
    """Per-pair Fellegi-Sunter score: Σ over fields of the agreement or
    disagreement weight — exact bigint micro-units. ``vectors`` carries the
    pair ids and boolean ``field_cols``; ``weights`` is ``match_weights``
    output (broadcast — constant-size)."""
    melt_args = ", ".join(
        f"'{f}', cast({f} as boolean)" for f in field_cols
    )
    long = vectors.selectExpr(
        *id_cols,
        f"stack({len(field_cols)}, {melt_args}) as (field, _agree)",
    )
    w = weights.select("field", "w_agree_micro", "w_disagree_micro")
    return (
        long.join(F.broadcast(w), "field")
        .groupBy(*id_cols)
        .agg(
            F.sum(
                F.when(F.col("_agree"), F.col("w_agree_micro")).otherwise(
                    F.col("w_disagree_micro")
                )
            )
            .cast("long")
            .alias("score_micro")
        )
    )
