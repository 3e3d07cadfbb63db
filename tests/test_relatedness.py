"""Milne-Witten relatedness + collective coherence rerank."""

from __future__ import annotations

import math

from xlink_spark.operators.relatedness import (
    MICRO,
    coherence_rerank,
    entity_relatedness,
)

# (doc_id, entity_id): e1/e2 co-occur in 3 docs, e1/e3 in 1, e4 isolated.
LINKS = [
    ("d1", "e1"), ("d1", "e2"),
    ("d2", "e1"), ("d2", "e2"),
    ("d3", "e1"), ("d3", "e2"), ("d3", "e3"),
    ("d4", "e3"),
    ("d5", "e4"),
    ("d6", "e1"),
]


def _py_relatedness(links, min_cooccur=2, max_doc_degree=None):
    docs = {}
    for d, e in set(links):
        docs.setdefault(d, set()).add(e)
    if max_doc_degree is not None:
        docs = {d: es for d, es in docs.items() if len(es) <= max_doc_degree}
    n_docs = len(docs)
    in_links = {}
    for d, es in docs.items():
        for e in es:
            in_links.setdefault(e, set()).add(d)
    out = {}
    ents = sorted(in_links)
    for i, a in enumerate(ents):
        for b in ents[i + 1 :]:
            ab = len(in_links[a] & in_links[b])
            if ab < min_cooccur:
                continue
            na, nb = len(in_links[a]), len(in_links[b])
            mx, mn = max(na, nb), min(na, nb)
            if mn == n_docs:
                rel = MICRO if ab == mx else 0
            else:
                sr = 1.0 - (math.log(mx) - math.log(ab)) / (
                    math.log(n_docs) - math.log(mn)
                )
                rel = math.floor(MICRO * max(sr, 0.0))
            out[(a, b)] = (na, nb, ab, rel)
    return out


def _collect_rel(df):
    return {
        (r["entity_a"], r["entity_b"]): (
            r["n_a"], r["n_b"], r["n_ab"], r["rel_micro"]
        )
        for r in df.collect()
    }


def test_relatedness_matches_python_replica(spark):
    links = spark.createDataFrame(LINKS, "doc_id string, entity_id string")
    got = _collect_rel(entity_relatedness(links, min_cooccur=1))
    assert got == _py_relatedness(LINKS, min_cooccur=1)
    # e1/e2: |A|=4 (d1,d2,d3,d6), |B|=3, |A∩B|=3 over N=6 linking docs
    na, nb, nab, rel = got[("e1", "e2")]
    assert (na, nb, nab) == (4, 3, 3)
    sr = 1.0 - (math.log(4) - math.log(3)) / (math.log(6) - math.log(3))
    assert rel == math.floor(MICRO * sr)


def test_min_cooccur_prunes_singleton_pairs(spark):
    links = spark.createDataFrame(LINKS, "doc_id string, entity_id string")
    got = _collect_rel(entity_relatedness(links, min_cooccur=2))
    assert got == _py_relatedness(LINKS, min_cooccur=2)
    assert ("e1", "e3") not in got  # co-occur once only
    assert ("e1", "e2") in got


def test_max_doc_degree_drops_hub_docs(spark):
    links = spark.createDataFrame(LINKS, "doc_id string, entity_id string")
    got = _collect_rel(
        entity_relatedness(links, min_cooccur=1, max_doc_degree=2)
    )
    # d3 (degree 3) is dropped entirely: e1/e3 pair disappears, e1/e2 keeps
    # the two-entity docs only.
    assert got == _py_relatedness(LINKS, min_cooccur=1, max_doc_degree=2)
    assert ("e1", "e3") not in got
    assert got[("e1", "e2")][2] == 2


def test_relatedness_duplicate_links_and_negative_clamp(spark):
    # duplicate (doc, entity) rows must not inflate counts; a weak pair on
    # a large universe drives sr negative -> exact 0 by the clamp.
    rows = LINKS + LINKS + [(f"d{i}", "e9") for i in range(10, 40)] + [
        ("d1", "e9")
    ]
    links = spark.createDataFrame(rows, "doc_id string, entity_id string")
    got = _collect_rel(entity_relatedness(links, min_cooccur=1))
    assert got == _py_relatedness(rows, min_cooccur=1)
    # e9 (31 docs) vs e2 (3 docs), 1 shared doc of N=36: sr < 0 -> 0
    assert got[("e2", "e9")][3] == 0


def test_relatedness_hub_entity_degenerate_denominator(spark):
    # An entity linked from EVERY doc makes ln N - ln min = 0; identical
    # in-link sets score exactly MICRO, anything else 0.
    rows = [("d1", "a"), ("d2", "a"), ("d1", "b"), ("d2", "b"), ("d1", "c")]
    links = spark.createDataFrame(rows, "doc_id string, entity_id string")
    got = _collect_rel(entity_relatedness(links, min_cooccur=1))
    assert got == _py_relatedness(rows, min_cooccur=1)
    assert got[("a", "b")][3] == MICRO  # both in every doc, identical sets
    assert got[("a", "c")][3] == 0  # hub vs subset: no signal


CANDS = [
    # doc A: mention (0,5) locally prefers x1 but x2 is related to the
    # pool; mention (10,15) is unambiguous y1.
    ("A", 0, 5, "x1", 600_000),
    ("A", 0, 5, "x2", 500_000),
    ("A", 10, 15, "y1", 900_000),
    # doc B: single mention, two candidates -> pure local order must hold
    # and the mention must SURVIVE (empty pool).
    ("B", 0, 3, "z1", 400_000),
    ("B", 0, 3, "z2", 700_000),
]
CAND_SCHEMA = (
    "doc_id string, start int, end int, entity_id string, believe_micro long"
)
REL = [("x2", "y1", 800_000), ("x1", "y1", 100_000)]
REL_SCHEMA = "entity_a string, entity_b string, rel_micro long"


def test_coherence_rerank_flips_to_related_candidate(spark):
    cand = spark.createDataFrame(CANDS, CAND_SCHEMA)
    rel = spark.createDataFrame(REL, REL_SCHEMA)
    got = {
        (r["doc_id"], r["start"], r["end"]): (
            r["entity_id"], r["pool_n"], r["coherence_sum"], r["score"]
        )
        for r in coherence_rerank(cand, rel).collect()
    }
    # pool for (A,0,5) = y1 (the other mention's top-1). x1: 600000*1 +
    # 100000 = 700000; x2: 500000*1 + 800000 = 1300000 -> x2 wins.
    assert got[("A", 0, 5)] == ("x2", 1, 800_000, 1_300_000)
    assert got[("A", 10, 15)][0] == "y1"


def test_coherence_rerank_keeps_single_mention_docs(spark):
    cand = spark.createDataFrame(CANDS, CAND_SCHEMA)
    rel = spark.createDataFrame(REL, REL_SCHEMA)
    got = {
        (r["doc_id"], r["start"], r["end"]): (
            r["entity_id"], r["pool_n"], r["score"]
        )
        for r in coherence_rerank(cand, rel).collect()
    }
    # doc B has ONE mention: empty pool, local order decides, row kept.
    assert got[("B", 0, 3)] == ("z2", 0, 700_000)
    assert len(got) == 3


def test_coherence_rerank_tie_breaks_on_entity_id(spark):
    rows = [
        ("A", 0, 5, "b", 500_000),
        ("A", 0, 5, "a", 500_000),
    ]
    cand = spark.createDataFrame(rows, CAND_SCHEMA)
    rel = spark.createDataFrame([], REL_SCHEMA)
    [r] = coherence_rerank(cand, rel).collect()
    assert r["entity_id"] == "a"


def test_coherence_rerank_max_pool_caps_fanout(spark):
    rows = [
        ("A", i * 10, i * 10 + 5, f"e{i}", 1_000_000 - i * 1000)
        for i in range(6)
    ]
    cand = spark.createDataFrame(rows, CAND_SCHEMA)
    rel = spark.createDataFrame([], REL_SCHEMA)
    got = coherence_rerank(cand, rel, max_pool=3).collect()
    # pool = top-3 mentions by local score; a member mention sees the other
    # 2, a non-member sees all 3.
    n = {r["start"]: r["pool_n"] for r in got}
    assert n == {0: 2, 10: 2, 20: 2, 30: 3, 40: 3, 50: 3}


def test_relatedness_and_rerank_plans_are_pure_jvm(spark):
    links = spark.createDataFrame(LINKS, "doc_id string, entity_id string")
    cand = spark.createDataFrame(CANDS, CAND_SCHEMA)
    rel = entity_relatedness(links, min_cooccur=1)
    plan1 = rel._jdf.queryExecution().executedPlan().toString()
    plan2 = (
        coherence_rerank(cand, rel)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for plan in (plan1, plan2):
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan


def test_coherence_iterate_round2_cascade_flip(spark):
    """A flip in round 1 (M2: b1→b2, pulled by M3's c) must propagate in
    round 2 (M1: a1→a2, pulled by the NEW winner b2) — the cascade only an
    iterated pool can produce."""
    from xlink_spark.operators.relatedness import (
        coherence_iterate,
        coherence_rerank,
    )

    cands = [
        ("D", 0, 2, "a1", 600_000),
        ("D", 0, 2, "a2", 500_000),
        ("D", 10, 12, "b1", 600_000),
        ("D", 10, 12, "b2", 500_000),
        ("D", 20, 22, "c", 900_000),
    ]
    rel = [("b2", "c", 800_000), ("a2", "b2", 900_000)]
    cdf = spark.createDataFrame(cands, CAND_SCHEMA)
    rdf = spark.createDataFrame(rel, REL_SCHEMA)
    r1 = {
        (r["start"]): r["entity_id"]
        for r in coherence_rerank(cdf, rdf).collect()
    }
    assert r1 == {0: "a1", 10: "b2", 20: "c"}
    r2 = {
        (r["start"]): r["entity_id"]
        for r in coherence_iterate(cdf, rdf, rounds=2).collect()
    }
    assert r2 == {0: "a2", 10: "b2", 20: "c"}
    # rounds=1 must equal the single rerank exactly
    one = {
        (r["start"], r["entity_id"], r["score"])
        for r in coherence_iterate(cdf, rdf, rounds=1).collect()
    }
    base = {
        (r["start"], r["entity_id"], r["score"])
        for r in coherence_rerank(cdf, rdf).collect()
    }
    assert one == base
    import pytest as _pt

    with _pt.raises(ValueError):
        coherence_iterate(cdf, rdf, rounds=0)
