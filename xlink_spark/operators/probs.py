"""The four probability tables + link_prob (SURVEY §2.4 A5/A6).

Reference: cal_4_prob_from_mention_anchors (generate_prob_files.py:84-153),
formulas also in "XLink 数据文件汇总.md":31-34. With A(e,m) = anchor count:

    P(e)     = A(e,*) / A(*,*)
    P(m|e)   = A(e,m) / A(e,*)
    P(e|m)   = A(e,m) / A(*,m)
    link(m)  = A(*,m)
    link_prob(m) = link(m) / freq(m)            (main.py:327)

Implementation: window sums over the (mention, entity, cnt) table — three
`sum() over (partition by …)` passes, no self-joins. At scale the windows
shuffle once by entity and once by mention; the grand total is a scalar
cross-join (broadcast). Spark resolves all of this into partial+final
hash aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def four_probs(mention_anchors: DataFrame) -> dict[str, DataFrame]:
    """Compute entity_prior, m_given_e, e_given_m, link_m in one pass.

    Returns dict of DataFrames keyed by table name. Division is plain double
    arithmetic to match the reference's float math.
    """
    w_e = Window.partitionBy("entity_id")
    w_m = Window.partitionBy("mention")
    enriched = (
        mention_anchors.withColumn("a_e", F.sum("cnt").over(w_e))
        .withColumn("a_m", F.sum("cnt").over(w_m))
    )
    total = mention_anchors.agg(F.sum("cnt").alias("a_all"))
    enriched = enriched.crossJoin(F.broadcast(total))

    entity_prior = (
        enriched.select("entity_id", "a_e", "a_all")
        .distinct()
        .select("entity_id", (F.col("a_e") / F.col("a_all")).alias("prior"))
    )
    m_given_e = enriched.select(
        "entity_id", "mention", (F.col("cnt") / F.col("a_e")).alias("p")
    )
    e_given_m = enriched.select(
        "mention", "entity_id", (F.col("cnt") / F.col("a_m")).alias("p")
    )
    link = enriched.select("mention", F.col("a_m").alias("link")).distinct()
    return {
        "entity_prior": entity_prior,
        "m_given_e": m_given_e,
        "e_given_m": e_given_m,
        "link_m": link,
    }


def link_prob(link_m: DataFrame, freq_m: DataFrame) -> DataFrame:
    """A6: the 4-field link_prob table (generate_prob_files.py:212-223).

    Output: (mention, link_m, freq_m, link_prob). freq(m) can undercount
    link(m) for surfaces that only ever appear inside anchors; the reference
    caps nothing, so link_prob may exceed 1 — preserved as-is.
    """
    return (
        link_m.join(freq_m, "mention", "inner")
        .select(
            "mention",
            F.col("link").alias("link_m"),
            F.col("freq").alias("freq_m"),
            (F.col("link") / F.col("freq")).alias("link_prob"),
        )
    )
