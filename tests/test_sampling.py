"""Deterministic sampling operators: hash-Bernoulli, mixing, quotas."""

import pytest
from pyspark.sql import functions as F

from xlink_spark.operators import sampling as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"document body {i}", lang)
        for i, lang in enumerate(
            ["en"] * 60 + ["de"] * 25 + ["zh"] * 15
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_sample_is_layout_invariant(docs):
    """Membership is a pure function of (id, salt): any repartitioning —
    the stand-in for a different cluster topology — keeps the same rows,
    which is exactly what df.sample's per-partition RNG does NOT give."""
    a = sorted(r["doc_id"] for r in S.hash_sample(docs, 0.4).collect())
    b = sorted(
        r["doc_id"]
        for r in S.hash_sample(docs.repartition(7, "lang"), 0.4).collect()
    )
    assert a == b and 0 < len(a) < 100


def test_hash_sample_salts_draw_independent_samples(docs):
    a = {r["doc_id"] for r in S.hash_sample(docs, 0.5, salt="s1").collect()}
    b = {r["doc_id"] for r in S.hash_sample(docs, 0.5, salt="s2").collect()}
    assert a != b  # different decisions...
    assert 0 < len(a) < 100 and 0 < len(b) < 100  # ...both near half


def test_hash_sample_fraction_monotone(docs):
    """p1 < p2 ⇒ sample(p1) ⊆ sample(p2): the bucket threshold nests, so
    growing a dataset budget only ADDS documents — no churn."""
    small = {r["doc_id"] for r in S.hash_sample(docs, 0.2).collect()}
    big = {r["doc_id"] for r in S.hash_sample(docs, 0.6).collect()}
    assert small <= big


def test_mixture_weights_math(docs, spark):
    """60/25/15 corpus → uniform target: zh (scarcest vs its share) caps
    the total at 45, so every stratum targets 15 docs; integer micro-unit
    arithmetic gives exact expected rates."""
    w = {r["lang"]: r.asDict() for r in
         S.mixture_weights(docs, {"en": 1, "de": 1, "zh": 1}).collect()}
    # share_u = 333333 each; zh (15 docs vs a 1/3 share) caps t_max
    share = int(1 * 1_000_000 / 3)
    t_max = min(n * 1_000_000 // share for n in (60, 25, 15))
    for lang, n in (("en", 60), ("de", 25), ("zh", 15)):
        n_target = share * t_max // 1_000_000
        assert w[lang]["n_docs"] == n
        assert w[lang]["n_target"] == n_target
        assert w[lang]["rate_u"] == n_target * 1_000_000 // n
    # the scarcest stratum keeps nearly everything (14/15: the micro-unit
    # floor of the 1/3 share costs one doc — exactness beats generosity)
    assert w["zh"]["n_target"] == 14 and w["zh"]["rate_u"] == 933_333


def test_mixture_weights_by_token_mass(docs):
    """mixture_weights_by reshapes integer MASS (e.g. tokens), not doc
    count: with per-doc mass 1 + doc_id % 5, the stratum masses differ
    from 3x the doc counts, and the exact micro-unit arithmetic applies
    to those masses."""
    weighted = docs.withColumn(
        "n_tokens", (F.col("doc_id") % 5 + 1).cast("long")
    )
    masses = {
        lang: sum(i % 5 + 1 for i in ids)
        for lang, ids in (
            ("en", range(0, 60)), ("de", range(60, 85)), ("zh", range(85, 100))
        )
    }
    share = int(1 * 1_000_000 / 3)
    t_max = min(m * 1_000_000 // share for m in masses.values())
    w = {r["lang"]: r.asDict() for r in
         S.mixture_weights_by(
             weighted, {"en": 1, "de": 1, "zh": 1}, "n_tokens"
         ).collect()}
    for lang, m in masses.items():
        target = share * t_max // 1_000_000
        assert w[lang]["mass"] == m
        assert w[lang]["mass_target"] == target
        assert w[lang]["rate_u"] == target * 1_000_000 // m


def test_mixture_weights_missing_stratum_is_loud(docs):
    """A target stratum with zero corpus rows caps the feasible total at 0
    — a degenerate all-zero plan, not a silently reskewed mixture."""
    w = S.mixture_weights(docs, {"en": 1, "fr": 1}).collect()
    assert all(r["n_target"] == 0 and r["rate_u"] == 0 for r in w)


def test_mixture_weights_rejects_zero_share(docs):
    with pytest.raises(ValueError):
        S.mixture_weights(docs, {"en": 1.0, "de": 1e-9})


def test_stratified_sample_composes_with_weights(docs):
    """weights → sample: untargeted strata drop entirely; per-stratum kept
    counts land within binomial range of n_target, and membership is again
    layout-invariant (same rows from a repartitioned corpus)."""
    w = S.mixture_weights(docs, {"en": 1, "de": 1})
    kept = S.stratified_hash_sample(docs, w, salt="mix")
    by_lang = {r["lang"]: r["n"] for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "zh" not in by_lang
    again = S.stratified_hash_sample(docs.repartition(5), w, salt="mix")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_quota_sample_exact_k_per_stratum(docs):
    q = S.quota_sample(docs, 10)
    by_lang = {r["lang"]: r["n"] for r in
               q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang == {"en": 10, "de": 10, "zh": 10}
    # k above a stratum's size keeps the whole stratum
    q2 = S.quota_sample(docs, 20)
    by2 = {r["lang"]: r["n"] for r in
           q2.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by2 == {"en": 20, "de": 20, "zh": 15}


def test_quota_prefilter_path_matches_plain(docs):
    """The counts-driven hash pre-filter (the head-stratum scale path) must
    select the IDENTICAL k docs: the pre-filter keeps exactly the rows with
    bucket < r, so the k smallest buckets all survive whenever ≥ k rows
    survive — pinned here, not assumed."""
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    plain = sorted(
        (r["lang"], r["doc_id"]) for r in S.quota_sample(docs, 8).collect()
    )
    pre = sorted(
        (r["lang"], r["doc_id"])
        for r in S.quota_sample(
            docs, 8, prefilter_counts=counts, oversample=3
        ).collect()
    )
    assert plain == pre


def test_stratified_sample_plan_shape(docs):
    """The corpus side never shuffles: the rate table broadcasts and the
    hash predicate filters at scan speed — no Exchange of doc rows, no
    Python anywhere."""
    w = S.mixture_weights(docs, {"en": 1, "de": 1})
    plan = (
        S.stratified_hash_sample(docs, w)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
