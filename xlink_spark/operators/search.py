"""BM25 keyword search over a document table — integer micro-unit scoring.

The reference resolves mentions against a dictionary; a corpus owner also
needs the inverse primitive — *find the documents for a query* — for eval-set
mining, targeted decontamination ("which training docs mention this
benchmark?"), and corpus debugging. This is Robertson/Spärck-Jones BM25
(k1 = 1.2, b = 0.75) re-expressed so that every decision is exact bigint
arithmetic and therefore bit-identical across engines and partitionings
(the lm_scores / decayed_priors convention):

* ``tf_part = (k1+1)·tf / (tf + k1(1-b) + k1·b·dl/avgdl)`` becomes, with
  k1 = 6/5 and b = 3/4 and dl/avgdl carried as micro-units,
  ``22·tf·1e6 / (10·tf·1e6 + 3·1e6 + 9·ρ_µ)`` — all integers.
* ``idf_µ = floor(ln((2N − 2df + 1)/(2df + 1)) · 1e6)``: the +0.5
  smoothing doubled into an exact integer ratio; ln() is the one float
  step, made portable by the floor-to-micro quantization (the PSI-drift
  precedent) and guarded by the measured-margin protocol before any
  oracle ships.
* tf saturates at ``tf_cap`` (default 1000, where tf_part is within 0.2%
  of its k1+1 asymptote) — this is what keeps ``idf_µ·22·tf·1e6`` under
  2^63 at any document length.

Scale shape: term frequencies come from ``size(filter(tokens, t = term))``
— a scan-speed higher-order-function projection, NO explode and NO
doc-grain shuffle; the per-query vocabulary (df per term, N, total length)
is ONE single-row aggregate broadcast back over the scan, and the only
exchange in the whole plan is the final top-k TakeOrderedAndProject heap.
At lake scale the corpus statistics are maintained incrementally rather
than recomputed per query — pass them via ``stats`` to skip the aggregate
branch entirely (then the query is one scan + one heap).

avgdl is folded exactly: ``avgdl_µ = (L div N)·1e6 + ((L mod N)·1e6) div N``
— the two-step split keeps every intermediate below 2^63 for corpora up to
~9·10^12 tokens per the mod term, i.e. web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# BM25 constants as exact rationals: k1 = 6/5, b = 3/4 →
# tf_part = 22·tf / (10·tf + 3 + 9·dl/avgdl)
_TF_NUM = 22
_TF_SELF = 10
_TF_CONST = 3
_TF_LEN = 9


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def _eq(term: str):
    # closure factory, NOT a default-arg lambda: a two-parameter lambda is
    # treated by PySpark's HOF binding as (element, index) and the second
    # parameter silently shadows the intended default
    return lambda x: x == F.lit(term)


def corpus_search_stats(
    docs: DataFrame, query_terms: list[str], text: str = "text"
) -> DataFrame:
    """Single-row frame (n_docs, total_len, df_<i> per term) — the whole
    per-query vocabulary in one partial-aggregated pass over the scan."""
    toks = _tokens(F.col(text))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("total_len"),
    ]
    for i, t in enumerate(query_terms):
        hit = F.size(F.filter(toks, _eq(t))) > 0
        aggs.append(F.sum(hit.cast("long")).alias(f"df_{i}"))
    return docs.agg(*aggs)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    tf_cap: int = 1000,
    doc_id: str = "doc_id",
    text: str = "text",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for a bag-of-words query, scored by integer BM25.

    Output: (doc_id, score_micro, rank) — rank 1..k by (score desc, doc_id
    asc), zero-score docs dropped before the heap. ``stats``: precomputed
    ``corpus_search_stats`` frame (the maintained-statistics path); omitted,
    it is computed from ``docs`` in a second scan branch.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    st = stats if stats is not None else corpus_search_stats(docs, terms, text)

    toks = _tokens(F.col(text))
    per_doc = docs.select(
        F.col(doc_id).cast("string").alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.least(
                F.size(F.filter(toks, _eq(t))),
                F.lit(tf_cap),
            )
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    ).crossJoin(F.broadcast(st))

    # exact integer avgdl_µ, then per-doc length ratio in micro-units
    avgdl_u = (
        F.expr("total_len div n_docs") * MICRO
        + F.expr(f"((total_len % n_docs) * {MICRO}) div n_docs")
    ).alias("avgdl_u")
    per_doc = per_doc.withColumn("avgdl_u", avgdl_u).withColumn(
        "rho_u", F.expr(f"(dl * {MICRO} * {MICRO}) div avgdl_u")
    )

    # one (num, den) bigint pair per term, then a single `num div den` sum —
    # `div` is Spark's exact 64-bit integer division (matches DuckDB `//`
    # for the non-negative operands here); float division would lose bits
    # above 2^53 long before the quotient is taken
    for i in range(len(terms)):
        # clamped at 0: Robertson idf goes negative for df > N/2 and a
        # stopword-grade term must contribute nothing, not a penalty
        idf_u = F.greatest(
            F.floor(
                F.log(
                    (2 * F.col("n_docs") - 2 * F.col(f"df_{i}") + 1).cast("double")
                    / (2 * F.col(f"df_{i}") + 1).cast("double")
                )
                * MICRO
            ).cast("long"),
            F.lit(0).cast("long"),
        )
        per_doc = per_doc.withColumn(
            f"num_{i}", idf_u * _TF_NUM * F.col(f"tf_{i}") * MICRO
        ).withColumn(
            f"den_{i}",
            F.lit(_TF_SELF) * F.col(f"tf_{i}") * MICRO
            + F.lit(_TF_CONST) * MICRO
            + F.lit(_TF_LEN) * F.col("rho_u"),
        )
    parts = [
        F.when(
            (F.col(f"tf_{i}") > 0) & (F.col(f"df_{i}") > 0),
            F.expr(f"num_{i} div den_{i}"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(len(terms))
    ]
    score = parts[0]
    for p in parts[1:]:
        score = score + p

    scored = per_doc.select(
        "doc_id", score.cast("long").alias("score_micro")
    ).filter(F.col("score_micro") > 0)
    ranked = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(k)
    from pyspark.sql import Window

    # unpartitioned window is fine HERE: it runs over the ≤ k rows that
    # survive the TakeOrderedAndProject heap, never over the corpus
    return ranked.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        ),
    )
