"""N-gram language-model quality scoring (CCNet-style fluency filter).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model trained on a clean reference corpus; low-fluency
documents are dropped or down-weighted. This module is that filter's
engine-portable analogue: a bigram stupid-backoff model (Brants et al.
2007) trained on a reference partition of the corpus itself, scoring every
document by its mean token probability.

Deliberately LOG-FREE: every probability is a ratio of two counts, carried
as exact integer micro-units (``p_u = c_num * 10^6 div c_den``), and the
document score is an integer mean of integer per-token scores — so the
whole operator is bigint arithmetic end to end, bit-identical across
engines (no ``ln()``, whose last-ulp behaviour differs between libm and
the JVM). The ranking this induces differs from true perplexity (it is an
arithmetic rather than geometric mean) but orders junk vs fluent text the
same way for filtering purposes.

Scale shape: the model tables are vocabulary-sized (unigrams + observed
bigrams of the reference) — the SMALL side of every join — so scoring is
two broadcast joins against the corpus bigram stream; the corpus is
touched exactly once, and no shuffle carries document text. The reference
has no LM filter (quality gating there is the link-probability threshold,
generate_prob_files.py:164-193); this is part of the training-data
curation layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000

# Stupid-backoff discount for unseen bigrams: alpha = 0.4 (Brants et al.
# 2007). Applied in integer arithmetic as p*2 div 5.
_BACKOFF_NUM, _BACKOFF_DEN = 2, 5


def _doc_bigrams(df: DataFrame, doc_id: str, text: str) -> DataFrame:
    """(doc_id, w1, w2) rows for every adjacent lowercase-token pair."""
    ts = F.filter(F.split(F.lower(F.col(text)), r"\s+"), lambda t: t != "")
    n = F.size(ts)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ts, 1, n - 1),
            F.slice(ts, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.select(doc_id, F.explode(pairs).alias("bg")).select(
        doc_id, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def train_bigram_lm(
    reference: DataFrame, text: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Count tables from the clean reference partition.

    Returns ``(unigrams, bigrams)``: ``unigrams`` = (w, c1, total) with the
    corpus-wide token total replicated per row (it is a scalar; carrying it
    as a column keeps the scoring join broadcast-only), ``bigrams`` =
    (w1, w2, c12).
    """
    toks = reference.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text)), r"\s+"), lambda t: t != "")
        ).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.agg(F.sum("c1").cast("long").alias("total"))
    unigrams = uni.crossJoin(F.broadcast(total))
    bigrams = (
        _doc_bigrams(reference.select(F.lit(1).alias("_d"), text), "_d", text)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    return unigrams, bigrams


def lm_scores(
    corpus: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document by mean stupid-backoff bigram probability.

    Per adjacent pair (w1, w2):
      * bigram seen in reference   → p_u = c12·10⁶ div c1(w1)
      * else w2 in vocabulary      → p_u = 0.4 · c1(w2)·10⁶ div total
      * else (w2 out-of-vocab)     → p_u = 0

    Output: (doc_id, n_bigrams, lm_score_u, oov_u) — ``lm_score_u`` is the
    integer mean of p_u over the doc's pairs (0 for docs with < 2 tokens),
    ``oov_u`` the OOV-pair fraction in micro-units. Exact bigint
    arithmetic throughout; overflow-safe while a doc has < 2⁶³/10⁶ pairs.

    ``broadcast_model=False`` drops the broadcast hints for reference
    corpora whose bigram table exceeds executor memory (a web-scale
    reference easily has 10⁹ observed bigrams) — the joins then shuffle on
    the word keys, which AQE will still broadcast if the tables turn out
    small enough.
    """
    hint = F.broadcast if broadcast_model else (lambda d: d)
    bg = _doc_bigrams(corpus, doc_id, text)
    scored = (
        bg.join(hint(bigrams), ["w1", "w2"], "left")
        .join(
            hint(unigrams.select(F.col("w").alias("w1"), F.col("c1").alias("c1_w1"))),
            "w1",
            "left",
        )
        .join(
            hint(
                unigrams.select(
                    F.col("w").alias("w2"), F.col("c1").alias("c1_w2"), "total"
                )
            ),
            "w2",
            "left",
        )
        .select(
            doc_id,
            F.when(
                F.col("c12").isNotNull(),
                F.expr(f"c12 * {_MICRO} div c1_w1"),
            )
            .when(
                F.col("c1_w2").isNotNull(),
                F.expr(
                    f"c1_w2 * {_MICRO} * {_BACKOFF_NUM} div ({_BACKOFF_DEN} * total)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("p_u"),
            F.col("c1_w2").isNull().cast("long").alias("is_oov"),
        )
    )
    agg = scored.groupBy(doc_id).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr(f"sum(p_u) div count(1)").cast("long").alias("lm_score_u"),
        F.expr(f"sum(is_oov) * {_MICRO} div count(1)").cast("long").alias("oov_u"),
    )
    # docs with < 2 tokens have no pairs — survive with zeros
    return (
        corpus.select(doc_id)
        .distinct()
        .join(agg, doc_id, "left")
        .select(
            doc_id,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_score_u", F.lit(0)).alias("lm_score_u"),
            F.coalesce("oov_u", F.lit(0)).alias("oov_u"),
        )
    )
