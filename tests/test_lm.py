"""N-gram LM quality scoring (operators/lm.py) — hand values + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from xlink_spark.operators.lm import lm_scores, train_bigram_lm

_M = 1_000_000


def test_lm_scores_hand_values(spark):
    """Reference 'a b a b a c': c1(a)=3 b=2 c=1 total=6; bigrams ab=2 ba=2
    ac=1. Doc 'a b a' → p(ab)=2·10⁶//3, p(ba)=2·10⁶//2 → mean exact.
    Doc 'a z a' → z OOV: p=0,oov + p(za)=backoff? no — 'z a': w2=a in
    vocab, bigram unseen → 0.4·c1(a)/total = 2·3·10⁶//(5·6)."""
    ref = spark.createDataFrame([("a b a b a c",)], "text string")
    uni, bg = train_bigram_lm(ref)
    corpus = spark.createDataFrame(
        [("d1", "a b a"), ("d2", "a z a"), ("d3", "solo"), ("d4", "")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in lm_scores(corpus, uni, bg).collect()}

    p_ab = 2 * _M // 3
    p_ba = 2 * _M // 2
    assert rows["d1"] == {
        "doc_id": "d1", "n_bigrams": 2,
        "lm_score_u": (p_ab + p_ba) // 2, "oov_u": 0,
    }
    p_za = 3 * _M * 2 // (5 * 6)  # backoff to unigram p(a)
    assert rows["d2"] == {
        "doc_id": "d2", "n_bigrams": 2,
        "lm_score_u": (0 + p_za) // 2, "oov_u": _M // 2,
    }
    # docs with < 2 tokens survive with zeros
    for d in ("d3", "d4"):
        assert rows[d] == {
            "doc_id": d, "n_bigrams": 0, "lm_score_u": 0, "oov_u": 0,
        }


def test_lm_scores_case_folding_and_whitespace(spark):
    """Tokenization lowercases and collapses runs of whitespace."""
    ref = spark.createDataFrame([("x y x y",)], "text string")
    uni, bg = train_bigram_lm(ref)
    corpus = spark.createDataFrame([("d", "X  y\tX")], "doc_id string, text string")
    r = lm_scores(corpus, uni, bg).collect()[0]
    assert r["n_bigrams"] == 2 and r["oov_u"] == 0 and r["lm_score_u"] > 0


def test_lm_query_is_pure_jvm_and_broadcasts(spark):
    """The driver query stays in JVM expressions (no Python eval nodes) and
    joins the model tables via broadcast."""
    from xlink_spark.driver_queries import q_lm_scores

    df = q_lm_scores(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_lm_scores_shuffle_join_path_identical(spark):
    """broadcast_model=False must produce identical rows (the 10⁹-bigram
    reference regime falls back to shuffle joins)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    uni, bg = train_bigram_lm(docs.filter(F.col("lang") == "en"))
    a = {tuple(r) for r in lm_scores(docs, uni, bg).collect()}
    b = {
        tuple(r)
        for r in lm_scores(docs, uni, bg, broadcast_model=False).collect()
    }
    assert a == b
