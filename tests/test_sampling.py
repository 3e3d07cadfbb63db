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


def test_hash_sample_threshold_rounds_not_floors(docs):
    """0.29·1e6 is 289999.99999... in binary float; the documented
    convention is round() → 290000, so membership must equal bucket <
    290000 exactly (the split_thresholds convention)."""
    kept = {r["doc_id"] for r in S.hash_sample(docs, 0.29).collect()}
    by_bucket = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", S.hash_bucket("doc_id").alias("b")
        ).collect()
        if r["b"] < 290_000
    }
    assert kept == by_bucket


def test_mixture_weights_by_survives_huge_masses(spark):
    """Token masses past int64/1e6 (~9.2e12) must not wrap: a 4e15-token
    stratum against a 1ppm share would overflow `mass * 1e6` in int64 and
    emit garbage rates; the decimal intermediates keep the arithmetic
    exact."""
    counts_docs = spark.createDataFrame(
        [(1, "a", 4_000_000_000_000_000), (2, "b", 4_000_000_000_000_000)],
        "doc_id long, lang string, w long",
    )
    w = {r["lang"]: r.asDict() for r in
         S.mixture_weights_by(
             counts_docs, {"a": 0.999999, "b": 0.000001}, "w"
         ).collect()}
    m = 4_000_000_000_000_000
    share_a, share_b = 999_999, 1
    t_max = min(m * 1_000_000 // share_a, m * 1_000_000 // share_b)
    for lang, share in (("a", share_a), ("b", share_b)):
        tgt = share * t_max // 1_000_000
        assert w[lang]["mass_target"] == tgt
        assert w[lang]["rate_u"] == tgt * 1_000_000 // m
    assert all(v["rate_u"] > 0 for v in w.values())


def test_quota_prefilter_unknown_stratum_is_not_thinned(docs, spark):
    """A stratum absent from prefilter_counts (stats from an older
    snapshot) must still deliver its exact k — no thinning, never silent
    deletion."""
    stale = spark.createDataFrame(
        [("en", 60), ("de", 25)], "lang string, n_docs long"
    )  # zh missing
    q = S.quota_sample(docs, 8, prefilter_counts=stale, oversample=4)
    by_lang = {r["lang"]: r["n"] for r in
               q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["zh"] == 8
    plain = sorted(
        (r["lang"], r["doc_id"]) for r in S.quota_sample(docs, 8).collect()
    )
    pre = sorted((r["lang"], r["doc_id"]) for r in q.collect())
    assert plain == pre


def test_hash_split_partitions_and_is_growth_stable(docs, spark):
    """90/5/5 split: every doc gets exactly one split; the assignment is a
    pure function of doc_id, so growing the corpus never moves an existing
    doc between train and test (the contamination guarantee)."""
    out = {r["doc_id"]: r["split"] for r in
           S.hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05},
                        salt="sp").select("doc_id", "split").collect()}
    assert len(out) == 100 and set(out.values()) <= {"train", "val", "test"}
    assert None not in out.values()  # fractions sum to 1 → full coverage
    assert sum(v == "train" for v in out.values()) > 70
    grown = docs.union(spark.createDataFrame(
        [(1000 + i, f"new doc {i}", "en") for i in range(50)],
        docs.schema,
    ))
    out2 = {r["doc_id"]: r["split"] for r in
            S.hash_split(grown, {"train": 0.9, "val": 0.05, "test": 0.05},
                         salt="sp").select("doc_id", "split").collect()}
    assert all(out2[k] == v for k, v in out.items())


def test_hash_split_heldout_and_validation(docs):
    """Fractions summing below 1 leave a NULL held-out remainder; bad
    fraction dicts fail loudly."""
    out = S.hash_split(docs, {"train": 0.5}, salt="sp").collect()
    splits = [r["split"] for r in out]
    assert splits.count(None) > 0 and splits.count("train") > 0
    with pytest.raises(ValueError):
        S.hash_split(docs, {"a": 0.7, "b": 0.5})
    with pytest.raises(ValueError):
        S.hash_split(docs, {"a": 0.5, "b": -0.1})
    with pytest.raises(ValueError):
        S.hash_split(docs, {})
    with pytest.raises(ValueError):  # sub-ppm fraction → zero-width bucket
        S.hash_split(docs, {"train": 0.9999996, "probe": 4e-7})


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
