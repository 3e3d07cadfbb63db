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

Architecture: every stage contributes to ONE narrow drop-list
``(doc_id, stage)`` — stages run on the survivors of the previous stage, so
each doc appears at most once, labeled by the first stage that dropped it.
The survivor set is a single anti-join of the corpus against that list, and
the audit is a per-stage count over the SAME list — so materializing
(kept, audit) computes each expensive stage (LSH band join, contamination
join) exactly once when the list is persisted (it is id+stage only — a few
bytes per dropped doc). Nothing per-group is ever collected: the exact-dup
path is a ``row_number`` window (dedup.exact_dup_drops), not a
collect_list, so degenerate hash groups stream through their reducer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xlink_spark.operators import dedup as DD
from xlink_spark.operators.textstats import quality_score


def curation_drops(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.2,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    neardup_threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    contamination_ngram: int = 13,
    contamination_min_hits: int = 1,
    persisted_out: list | None = None,
) -> tuple[DataFrame, list[str]]:
    """The chained drop-list: ``((doc_id, stage), stage_names)``.

    Each stage sees only the survivors of the previous stages, so a doc
    appears at most once. ``stage_names`` is the ordered list of stages that
    were active (repetition/contamination are optional), for zero-preserving
    audits.
    """
    # 1. exact dedup: row_number()>1 window — the scale-safe drop path
    exact_drops = DD.exact_dup_drops(docs, text_col, id_col).select(
        id_col, F.lit("exact_dup").alias("stage")
    )
    after_exact = docs.join(exact_drops.select(id_col), id_col, "left_anti")

    # 2. quality gate: pure scan-speed expression
    scored = after_exact.withColumn("quality", quality_score(text_col))
    if persisted_out is not None:
        # The gate cache is the NARROW (doc_id, quality) projection, never
        # the full-text rows: the low-quality drop branch needs only ids and
        # scores, and a corpus-wide full-width cache is ~a corpus copy in
        # MEMORY_AND_DISK at 100 TB. Text flows ONCE through the kept chain
        # instead (after_quality persists below, where its text genuinely
        # feeds two branches). Owner unpersists — contract.
        # Cache LEVELS are deliberately capped at r4's five (gate,
        # after_quality, shingles, near_drops, drops): persisting the
        # exact-dup or repetition id-lists as additional layers measured
        # 1.7-2.3x WORSE wall time on this chain — every extra nested
        # in-memory-relation level multiplies AQE's per-query planning and
        # provenance-printing cost, which dominates at bench scale and adds
        # driver overhead at any scale.
        gate = scored.select(id_col, "quality").persist()
        persisted_out.append(gate)
        low = gate.filter(F.col("quality") < min_quality).select(
            id_col, F.lit("low_quality").alias("stage")
        )
    else:
        low = scored.filter(F.col("quality") < min_quality).select(
            id_col, F.lit("low_quality").alias("stage")
        )
    after_quality = scored.filter(F.col("quality") >= min_quality).drop("quality")
    stages = ["exact_dup", "low_quality"]
    parts = [exact_drops, low]

    # 2b. repetition gate (Gopher rules), only when a threshold is set
    if max_dup_line_frac is not None or max_top_bigram_frac is not None:
        from xlink_spark.operators.textstats import repetition_stats

        rep = repetition_stats(after_quality, text_col, id_col)
        bad = F.lit(False)
        if max_dup_line_frac is not None:
            bad = bad | (F.col("dup_line_frac_u") > int(max_dup_line_frac * 1e6))
        if max_top_bigram_frac is not None:
            bad = bad | (F.col("top_bigram_frac_u") > int(max_top_bigram_frac * 1e6))
        rep_drops = rep.filter(bad).select(id_col, F.lit("repetitive").alias("stage"))
        after_quality = after_quality.join(rep_drops.select(id_col), id_col, "left_anti")
        stages.append("repetitive")
        parts.append(rep_drops)
    if persisted_out is not None:
        # consumed by the shingle scan AND (with an eval set) the
        # contamination branch: cut the upstream chain off both
        after_quality = after_quality.persist()
        persisted_out.append(after_quality)

    # 3. near-dup: banded-LSH pairs (cap active), larger id loses
    pairs = DD.minhash_dedup(
        after_quality,
        text_col,
        id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=neardup_threshold,
        persisted_out=persisted_out,
    )
    near_drops = (
        pairs.select(F.col("doc_b").alias(id_col))
        .distinct()
        .select(id_col, F.lit("near_dup").alias("stage"))
    )
    if persisted_out is not None and eval_docs is not None:
        # near_drops feeds BOTH the drop-list union and (through after_near)
        # the contamination branch; Spark shares no common subplans across
        # union legs, so without this persist the LSH band join + Jaccard
        # verify — the most expensive shuffles in the chain — would execute
        # twice in the first materialization. The list is id-only (tiny).
        near_drops = near_drops.persist()
        persisted_out.append(near_drops)
    stages.append("near_dup")
    parts.append(near_drops)

    # 4. decontamination vs the held-out set (broadcast eval shingles)
    if eval_docs is not None:
        after_near = after_quality.join(
            near_drops.select(id_col), id_col, "left_anti"
        )
        contaminated = DD.contamination_hits(
            after_near, eval_docs, text_col, id_col,
            ngram=contamination_ngram, min_hits=contamination_min_hits,
        ).select(id_col, F.lit("contaminated").alias("stage"))
        stages.append("contaminated")
        parts.append(contaminated)

    return reduce(DataFrame.unionByName, parts), stages


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
    num_hashes: int = 16,
    bands: int = 4,
    contamination_ngram: int = 13,
    contamination_min_hits: int = 1,
    persisted_out: list | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Chain dedup → quality → near-dup → decontamination over ``docs``.

    Returns ``(kept, audit, drops)``:

    * ``kept`` — the surviving rows with a ``quality`` column attached (and,
      with ``redact=True``, PII-scrubbed ``text`` plus n_emails/n_phones);
    * ``audit`` — one row per active stage (stage, n_dropped), zero counts
      included;
    * ``drops`` — the (doc_id, stage) list itself, for per-doc accounting.

    ``kept`` and ``audit`` both derive from the single ``drops`` list, so
    with ``persisted_out`` passed the expensive stages (LSH band join,
    contamination join) run ONCE no matter how many of the three outputs are
    materialized: ``drops`` is persisted (id+stage only) and appended to the
    list for the caller to unpersist — the library-wide contract. Without
    ``persisted_out`` nothing is persisted (leak-free default) and each
    materialized output recomputes the chain.
    """
    drops, stages = curation_drops(
        docs,
        eval_docs,
        text_col,
        id_col,
        min_quality=min_quality,
        max_dup_line_frac=max_dup_line_frac,
        max_top_bigram_frac=max_top_bigram_frac,
        neardup_threshold=neardup_threshold,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        contamination_ngram=contamination_ngram,
        contamination_min_hits=contamination_min_hits,
        persisted_out=persisted_out,
    )
    if persisted_out is not None:
        # the stage-wise union stacks partitions (n_stages × input parts);
        # coalesce the narrow id+stage list back to the session's
        # parallelism before caching — merges map work, no extra shuffle
        par = docs.sparkSession.sparkContext.defaultParallelism
        drops = drops.coalesce(max(par, 1)).persist()
        persisted_out.append(drops)

    kept = docs.join(drops.select(id_col), id_col, "left_anti").withColumn(
        "quality", quality_score(text_col)
    )

    # 5. PII scrub on the survivors only (no wasted work on dropped docs)
    if redact:
        from xlink_spark.operators.textstats import redact_pii

        pii = redact_pii(kept, text_col, id_col)
        kept = (
            kept.drop(text_col)
            .join(pii, id_col)
            .withColumnRenamed("redacted", text_col)
        )

    audit_parts = [
        drops.filter(F.col("stage") == s)
        .agg(F.count(F.lit(1)).alias("n_dropped"))
        .select(F.lit(s).alias("stage"), "n_dropped")
        for s in stages
    ]
    audit = reduce(DataFrame.unionByName, audit_parts)
    return kept, audit, drops
