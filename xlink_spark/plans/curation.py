"""End-to-end corpus curation plan: the operators a 100 TB training-data
pipeline chains before any model sees a byte.

Composes the individually oracle-checked operators into one declarative
plan over a documents table:

  1. exact dedup         — keep the min-id copy of byte-identical docs
  2. quality gate        — drop docs below a quality_score threshold
  2b. repetition gate    — drop docs above Gopher-style dup-line /
                           top-bigram fractions (optional)
  3. MinHash-LSH near-dup — drop the larger-id side of each verified pair
  4. decontamination     — drop docs sharing n-grams with a held-out set
  5. PII redaction       — scrub emails/phones from the survivors (optional)

Each stage only SHRINKS the survivor set, so the stages compose as
anti-joins on small drop-lists — the corpus body is scanned once per
stage-input, never collected, and every pair product inherits the blocked/
capped shapes of the underlying operators. Per-stage drop accounting rides
an audit DataFrame (stage, n_dropped) instead of driver-side counts, so a
caller can write corpus + audit in the same job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xlink_spark.operators import dedup as DD
from xlink_spark.operators.textstats import quality_score


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.2,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    redact: bool = False,
    neardup_threshold: float = 0.8,
    shingle_n: int = 3,
    contamination_ngram: int = 13,
    contamination_min_hits: int = 1,
    persisted_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Chain dedup → quality → near-dup → decontamination over ``docs``.

    Returns ``(kept, audit)``: ``kept`` is the surviving (id, text, …) rows
    with a ``quality`` column attached; ``audit`` is one row per stage
    (stage, n_dropped) — materialize both in one action via a union write or
    two actions sharing the persisted intermediates (pass ``persisted_out``
    to release them afterwards, the library-wide contract).
    """
    # 1. exact dedup: non-keepers out (hash groupBy, map-side combined)
    exact = DD.exact_duplicates(docs, text_col, id_col)
    exact_drops = exact.select(
        F.explode(F.filter("doc_ids", lambda d: d != F.col("keeper"))).alias(id_col)
    )
    after_exact = docs.join(exact_drops, id_col, "left_anti")

    # 2. quality gate: pure scan-speed expression
    scored = after_exact.withColumn("quality", quality_score(text_col))
    after_quality = scored.filter(F.col("quality") >= min_quality)

    # 2b. repetition gate (Gopher rules), only when a threshold is set
    rep_drops = None
    if max_dup_line_frac is not None or max_top_bigram_frac is not None:
        from xlink_spark.operators.textstats import repetition_stats

        rep = repetition_stats(after_quality, text_col, id_col)
        bad = F.lit(False)
        if max_dup_line_frac is not None:
            bad = bad | (F.col("dup_line_frac_u") > int(max_dup_line_frac * 1e6))
        if max_top_bigram_frac is not None:
            bad = bad | (F.col("top_bigram_frac_u") > int(max_top_bigram_frac * 1e6))
        rep_drops = rep.filter(bad).select(id_col)
        after_quality = after_quality.join(rep_drops, id_col, "left_anti")
    if persisted_out is not None:
        # three downstream consumers (near-dup pairs, contamination, kept)
        after_quality = after_quality.persist()
        persisted_out.append(after_quality)

    # 3. near-dup: banded-LSH pairs (cap active), larger id loses
    pairs = DD.minhash_dedup(
        after_quality,
        text_col,
        id_col,
        shingle_n=shingle_n,
        threshold=neardup_threshold,
        persisted_out=persisted_out,
    )
    near_drops = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    after_near = after_quality.join(near_drops, id_col, "left_anti")

    # 4. decontamination vs the held-out set (broadcast eval shingles)
    if eval_docs is not None:
        contaminated = DD.contamination_hits(
            after_near, eval_docs, text_col, id_col,
            ngram=contamination_ngram, min_hits=contamination_min_hits,
        ).select(id_col)
        kept = after_near.join(contaminated, id_col, "left_anti")
    else:
        contaminated = None
        kept = after_near

    # 5. PII scrub on the survivors only (no wasted work on dropped docs)
    if redact:
        from xlink_spark.operators.textstats import redact_pii

        pii = redact_pii(kept, text_col, id_col)
        kept = (
            kept.drop(text_col)
            .join(pii, id_col)
            .withColumnRenamed("redacted", text_col)
        )

    def n(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_dropped"))

    audit_parts = [
        n(exact_drops).select(F.lit("exact_dup").alias("stage"), "n_dropped"),
        n(scored.filter(F.col("quality") < min_quality)).select(
            F.lit("low_quality").alias("stage"), "n_dropped"
        ),
        n(near_drops).select(F.lit("near_dup").alias("stage"), "n_dropped"),
    ]
    if rep_drops is not None:
        audit_parts.insert(
            2, n(rep_drops).select(F.lit("repetitive").alias("stage"), "n_dropped")
        )
    if contaminated is not None:
        audit_parts.append(
            n(contaminated).select(F.lit("contaminated").alias("stage"), "n_dropped")
        )
    audit = audit_parts[0]
    for p in audit_parts[1:]:
        audit = audit.unionByName(p)
    return kept, audit
