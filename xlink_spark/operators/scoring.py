"""Pairwise (mention, candidate-entity) scoring (SURVEY §2.2 F6-F8,
§2.4 A7/A8, §2.5 W3-W5, §2.8 C8-C11).

Reference lifecycle: xlink.py:107-354. Set-oriented redesign — every stage
is a DataFrame transform over the exploded (mention × candidate) table:

  mentions ─┬─ attach_context ── context_word_vector (A7)
            ├─ seeds (unambiguous mentions, xlink.py:115-145)
            │        └─ per-doc seed pool → context_entity_vector (A8, U3)
            └─ candidates ⋈ e_given_m ⋈ entity_embeddings
                     └─ believe fusion (C9/C10) → gates (F6-F8) → top-1 (W4)

Cosines are JVM-side column expressions (functions.vectors.cosine) — the
whole scoring stage is one shuffle-free projection after the joins.

Semantic pins (tests hold these):
  * empty context words ⇒ word_sim = 0            (xlink.py:319)
  * empty context entities ⇒ ent_sim = 1 on the has-prob path
    (xlink.py:329) but 0 on the no-prob/GM path     (Predictor.py:210)
  * a mention's own seed is excluded from its context pool (xlink.py:241-254)
  * W5's intended semantics is argmax by word_sim (the reference's
    `max_sim`-never-updated bug, Predictor.py:140-144, is NOT reproduced)
  * W3's intended semantics keeps prob-mentions per overlap group (the
    reference's always-true `len(...) is not None`, xlink.py:299/310, is
    NOT reproduced)
  * ties everywhere break on ascending entity_id for determinism (the
    reference relies on Python sort stability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xlink_spark.config import PredictorConfig
from xlink_spark.functions.text import tokens_lower
from xlink_spark.functions.vectors import cosine, mean_pool_expr

MENTION_KEY = ["doc_id", "start", "end"]


def attach_context(
    mentions: DataFrame, docs_plain: DataFrame, cfg: PredictorConfig | None = None
) -> DataFrame:
    """C13: ±window-char context strings around each mention (xlink.py:120-127)."""
    cfg = cfg or PredictorConfig()
    w = cfg.context_window
    joined = mentions.join(docs_plain.select("doc_id", "text"), "doc_id", "inner")
    prev_start = F.greatest(F.col("start") - w, F.lit(0))
    return joined.select(
        *mentions.columns,
        F.substring(F.col("text"), prev_start + 1, F.col("start") - prev_start).alias(
            "ctx_prev"
        ),
        F.substring(F.col("text"), F.col("end") + 1, w).alias("ctx_after"),
    )


def context_word_vector(mentions_ctx: DataFrame, word_emb: DataFrame) -> DataFrame:
    """A7: mean-pool of in-vocabulary context-word vectors per mention.

    Explode tokens → broadcast-join the word table (acts as the vocab filter,
    xlink.py:124-127) → mean pool. Null ``ctx_vec`` means empty context.
    """
    toks = mentions_ctx.select(
        *MENTION_KEY,
        F.explode(
            F.concat(
                tokens_lower("ctx_prev"),
                tokens_lower("ctx_after"),
            )
        ).alias("word"),
    )
    vecs = toks.join(
        F.broadcast(word_emb.withColumnRenamed("key", "word")), "word", "inner"
    )
    pooled = vecs.groupBy(*MENTION_KEY).agg(F.collect_list("vec").alias("vecs"))
    pooled = pooled.select(*MENTION_KEY, mean_pool_expr("vecs").alias("ctx_vec"))
    return mentions_ctx.join(pooled, MENTION_KEY, "left")


def candidate_table(
    mentions: DataFrame,
    mention_anchors: DataFrame,
    e_given_m: DataFrame,
    entity_emb: DataFrame,
) -> DataFrame:
    """Explode mention × candidate with prior + embedding columns.

    F6/F4 at predict time: candidates without an embedding are dropped
    (inner join), as are candidates absent from e_given_m (xlink.py:196-206,
    Predictor.py:117-126).
    """
    cands = mentions.withColumn("mention", F.lower("surface")).join(
        mention_anchors.select("mention", "entity_id"), "mention", "inner"
    )
    cands = cands.join(e_given_m, ["mention", "entity_id"], "inner")
    cands = cands.join(
        entity_emb.select(F.col("key").alias("entity_id"), F.col("vec").alias("entity_vec")),
        "entity_id",
        "inner",
    )
    return cands


def seed_pool(candidates: DataFrame) -> DataFrame:
    """Unambiguous-mention seeds (xlink.py:115-145).

    A mention with exactly one surviving candidate contributes that entity's
    vector to its document's context pool. Returns per-doc aggregates plus
    the per-mention contribution needed for self-exclusion (U3):
    (doc_id, start, end, seed_vec, doc_sum, doc_cnt).
    """
    w_m = Window.partitionBy(*MENTION_KEY)
    seeds = (
        candidates.withColumn("n_cands", F.count(F.lit(1)).over(w_m))
        .filter(F.col("n_cands") == 1)
        .select(*MENTION_KEY, F.col("entity_vec").alias("seed_vec"))
    )
    doc_agg = seeds.groupBy("doc_id").agg(
        F.collect_list("seed_vec").alias("doc_seed_vecs"),
        F.count(F.lit(1)).alias("doc_seed_cnt"),
    )
    return seeds, doc_agg


def context_entity_vector(
    candidates: DataFrame,
    seeds: DataFrame,
    doc_agg: DataFrame,
    empty_sim: float,
) -> DataFrame:
    """A8 + U3: per-candidate context-entity similarity.

    The pool for mention m = all seed vectors of the doc EXCLUDING m's own
    seed (xlink.py:241-254). Implemented without a per-pair join: per-doc
    sum/count minus the mention's own contribution, elementwise.
    ``empty_sim`` is the empty-pool convention: 1.0 on the has-prob path
    (xlink.py:329), 0.0 on the no-prob/GM path (Predictor.py:210).
    """
    c = candidates.join(doc_agg, "doc_id", "left").join(
        seeds.select(*MENTION_KEY, "seed_vec"), MENTION_KEY, "left"
    )
    # pool sum = doc_sum − own_seed (when this mention seeded)
    pool_sum = F.when(
        F.col("doc_seed_vecs").isNull(), F.lit(None)
    ).otherwise(
        F.aggregate(
            "doc_seed_vecs",
            F.transform(
                F.coalesce(
                    F.col("seed_vec"),
                    F.transform(F.element_at("doc_seed_vecs", 1), lambda x: x * 0),
                ),
                lambda x: -x.cast("double"),
            ),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
        )
    )
    pool_cnt = F.coalesce(F.col("doc_seed_cnt"), F.lit(0)) - F.when(
        F.col("seed_vec").isNotNull(), F.lit(1)
    ).otherwise(F.lit(0))
    c = c.withColumn("pool_cnt", pool_cnt).withColumn(
        "pool_vec",
        F.when(
            F.col("pool_cnt") > 0,
            F.transform(pool_sum, lambda x: x / F.col("pool_cnt")),
        ),
    )
    c = c.withColumn(
        "ctx_ent_sim",
        F.when(F.col("pool_vec").isNull(), F.lit(empty_sim)).otherwise(
            cosine("entity_vec", "pool_vec")
        ),
    )
    return c.drop("doc_seed_vecs", "doc_seed_cnt", "seed_vec", "pool_vec", "pool_cnt")


def score_has_prob(
    candidates: DataFrame,
    link_prob: DataFrame,
    cfg: PredictorConfig | None = None,
) -> DataFrame:
    """The has-prob scoring path (xlink.py:147-176, 347-354).

    Expects candidates with ``ctx_vec``, ``ctx_ent_sim``, ``p`` (=P(e|m)),
    ``entity_vec``. Produces per-mention winners with believe scores:

      cand_believe = P(e|m)^α · word_sim · ent_sim       (believe_score_v2)
      mention_believe = (best_cand_believe + link_prob)/2 (xlink.py:172-173)
      gates: link_prob > link_prob_th AND believe > believe_th
    """
    cfg = cfg or PredictorConfig()
    scored = candidates.withColumn(
        "ctx_word_sim",
        F.when(F.col("ctx_vec").isNull(), F.lit(0.0)).otherwise(
            cosine("entity_vec", "ctx_vec")
        ),
    ).withColumn(
        "cand_believe",
        F.pow("p", F.lit(cfg.prior_power)) * F.col("ctx_word_sim") * F.col("ctx_ent_sim"),
    )
    top = Window.partitionBy(*MENTION_KEY).orderBy(
        F.col("cand_believe").desc(), F.col("entity_id").asc()
    )
    best = scored.withColumn("rn", F.row_number().over(top)).filter(F.col("rn") == 1)
    gated = (
        best.join(link_prob.select("mention", "link_prob"), "mention", "inner")
        .withColumn("believe", (F.col("cand_believe") + F.col("link_prob")) / 2)
        .filter(
            (F.col("link_prob") > cfg.link_prob_th) & (F.col("believe") > cfg.believe_th)
        )
    )
    return gated.select(
        *MENTION_KEY,
        "surface",
        "entity_id",
        "believe",
        F.lit("ma").alias("parse_from"),
    )


def score_no_prob(
    candidates: DataFrame, cfg: PredictorConfig | None = None
) -> DataFrame:
    """The no-prob (title-dict) path — xlink.py:179-270 / Predictor.py:99-196.

    Expects candidates with ``ctx_vec``, ``ctx_ent_sim`` (empty ⇒ 0),
    ``entity_vec``. believe = w·word_sim + (1−w)·ent_sim; candidate gate
    word_sim > np_ctx_word_sim_th; mention gate best believe > np_believe_th.
    """
    cfg = cfg or PredictorConfig()
    scored = (
        candidates.withColumn(
            "ctx_word_sim",
            F.when(F.col("ctx_vec").isNull(), F.lit(0.0)).otherwise(
                cosine("entity_vec", "ctx_vec")
            ),
        )
        .filter(F.col("ctx_word_sim") > cfg.np_ctx_word_sim_th)
        .withColumn(
            "believe",
            cfg.np_words_weight * F.col("ctx_word_sim")
            + (1 - cfg.np_words_weight) * F.col("ctx_ent_sim"),
        )
    )
    top = Window.partitionBy(*MENTION_KEY).orderBy(
        F.col("believe").desc(), F.col("entity_id").asc()
    )
    best = (
        scored.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") == 1)
        .filter(F.col("believe") > cfg.np_believe_th)
    )
    return best.select(
        *MENTION_KEY,
        "surface",
        "entity_id",
        "believe",
        F.lit("tt").alias("parse_from"),
    )


def seed_argmax(candidates: DataFrame, cfg: PredictorConfig | None = None) -> DataFrame:
    """W5: per-mention argmax by word_sim, kept iff sim > seed threshold.

    Intended semantics of xlink.py:213-225 (the reference's stale `max_sim`
    bug is documented there; we implement the argmax it meant to compute).
    """
    cfg = cfg or PredictorConfig()
    scored = candidates.withColumn(
        "ctx_word_sim",
        F.when(F.col("ctx_vec").isNull(), F.lit(0.0)).otherwise(
            cosine("entity_vec", "ctx_vec")
        ),
    )
    return (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*MENTION_KEY).orderBy(
                    F.col("ctx_word_sim").desc(), F.col("entity_id").asc()
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("ctx_word_sim") > cfg.np_seed_th))
        .select(*MENTION_KEY, "entity_id", "ctx_word_sim")
    )


def merge_results(prob_links: DataFrame, no_prob_links: DataFrame) -> DataFrame:
    """W3: merge the two passes — prob wins overlap groups (xlink.py:272-316).

    Same overlap-group window as resolve_conflicts; within a group keep all
    'ma' rows if any exist, else the 'tt' rows.
    """
    both = prob_links.unionByName(no_prob_links)
    w_scan = (
        Window.partitionBy("doc_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = both.withColumn(
        "new_group",
        (F.col("start") >= F.coalesce(F.max("end").over(w_scan), F.lit(-1))).cast("int"),
    ).withColumn(
        "grp",
        F.sum("new_group").over(
            Window.partitionBy("doc_id")
            .orderBy("start", "end")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    w_grp = Window.partitionBy("doc_id", "grp")
    return (
        grouped.withColumn(
            "grp_has_ma", F.max((F.col("parse_from") == "ma").cast("int")).over(w_grp)
        )
        .filter((F.col("parse_from") == "ma") | (F.col("grp_has_ma") == 0))
        .drop("new_group", "grp", "grp_has_ma")
    )
