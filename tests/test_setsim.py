"""Exact prefix-filtered set-similarity join (operators/setsim)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from xlink_spark.operators import setsim as SS


def _mk_shingles(spark, docs: dict[str, set[str]]):
    rows = [(d, s) for d, ss in docs.items() for s in ss]
    return spark.createDataFrame(rows, "doc_id string, shingle string")


def _brute(docs: dict[str, set[str]], t_ppm: int):
    out = []
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        uni = len(docs[a] | docs[b])
        if inter * SS.PPM >= t_ppm * uni:
            out.append((a, b, inter, uni, inter * SS.PPM // uni))
    return sorted(out)


def test_exact_join_matches_brute_force_random(spark):
    """Randomized completeness+exactness: prefix filtering must find EVERY
    pair >= t (the whole point vs LSH), with exact integer counts."""
    rng = random.Random(20260818)
    vocab = [f"s{i}" for i in range(40)]
    docs = {
        f"d{k:02d}": {rng.choice(vocab) for _ in range(rng.randint(3, 25))}
        for k in range(40)
    }
    for t_ppm in (300_000, 500_000, 800_000):
        got = sorted(
            (r["doc_a"], r["doc_b"], r["inter"], r["uni"], r["jac_ppm"])
            for r in SS.jaccard_join_exact(
                _mk_shingles(spark, docs), threshold_ppm=t_ppm
            ).collect()
        )
        assert got == _brute(docs, t_ppm), t_ppm
    assert len(_brute(docs, 300_000)) > 0


def test_threshold_boundary_pair_is_decided_exactly(spark):
    # inter=1, uni=2 -> jaccard exactly 0.5
    docs = {"a": {"x", "y"}, "b": {"x"}}
    sh = _mk_shingles(spark, docs)
    assert SS.jaccard_join_exact(sh, threshold_ppm=500_000).count() == 1
    assert SS.jaccard_join_exact(sh, threshold_ppm=500_001).count() == 0


def test_prefix_candidates_complete_and_pruning(spark):
    """Candidates ⊇ all true pairs, and the prefix join PRUNES: docs sharing
    only the corpus-wide head shingle never become candidates at high t."""
    # every doc contains the head shingle "common"; only d0/d1 are near-dups
    docs = {
        "d0": {"common", "a", "b", "c"},
        "d1": {"common", "a", "b", "d"},
        "d2": {"common", "e", "f", "g", "h", "i"},
        "d3": {"common", "j", "k", "l", "m", "n"},
    }
    sh = _mk_shingles(spark, docs)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in SS.prefix_candidates(sh, 500_000).collect()
    }
    true_pairs = {(a, b) for a, b, *_ in _brute(docs, 500_000)}
    assert true_pairs <= cands
    assert ("d2", "d3") not in cands  # head-shingle-only overlap pruned
    n_all = len(docs) * (len(docs) - 1) // 2
    assert len(cands) < n_all


def test_exact_join_is_superset_of_lsh_at_same_threshold(spark):
    """On the same corpus, the exact join must find every pair the
    probabilistic LSH path verified (LSH ⊆ exact — the recall relationship
    that motivates having both)."""
    from xlink_spark.operators import dedup as DD

    rng = random.Random(7)
    base = [f"w{i}" for i in range(30)]
    rows = []
    for k in range(20):
        toks = [rng.choice(base) for _ in range(30)]
        rows.append((f"d{k:02d}", " ".join(toks)))
        if k % 3 == 0:  # truncated near-dup
            rows.append((f"d{k:02d}x", " ".join(toks[: int(len(toks) * 0.8)])))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    sh = DD.shingles(docs, n=3)
    lsh = {
        tuple(sorted((r["doc_a"], r["doc_b"])))
        for r in DD.minhash_dedup(
            docs, shingle_n=3, num_hashes=8, bands=4, threshold=0.5
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in SS.jaccard_join_exact(sh, threshold_ppm=500_000).collect()
    }
    assert lsh <= exact and len(exact) > 0


def test_duplicate_shingle_rows_are_deduped_by_default(spark):
    """Duplicate (doc, shingle) rows inflate counts and silently DROP true
    pairs unless deduped — the default must protect, with assume_distinct
    as the explicit scale opt-out."""
    docs = {"a": {"x", "y"}, "b": {"x", "y"}}
    clean = _mk_shingles(spark, docs)
    dup = clean.union(clean.where(F.col("doc_id") == "a"))  # doc a doubled
    key = lambda df: sorted(
        (r["doc_a"], r["doc_b"], r["inter"], r["uni"]) for r in df.collect()
    )
    assert key(SS.jaccard_join_exact(dup)) == key(SS.jaccard_join_exact(clean))
    assert key(SS.jaccard_join_exact(clean, assume_distinct=True)) == [
        ("a", "b", 2, 2)
    ]


def test_plan_has_no_cartesian(spark):
    sh = _mk_shingles(spark, {"a": {"x", "y"}, "b": {"x", "z"}})
    plan = (
        SS.jaccard_join_exact(sh)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
