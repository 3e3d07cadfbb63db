"""Deletion-neighborhood fuzzy surface matching (operators/fuzzy)."""

from __future__ import annotations

import random

from xlink_spark.operators import fuzzy as FZ


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_variants_expr(spark):
    row = spark.createDataFrame([("book",), ("ab",)], "s string").select(
        FZ.deletion_variants("s").alias("v")
    ).collect()
    # repeated-char deletions collapse: book -> {book, ook, bok, boo}
    assert sorted(row[0]["v"]) == ["bok", "boo", "book", "ook"]
    assert sorted(row[1]["v"]) == ["a", "ab", "b"]


def test_fuzzy_candidates_match_brute_force(spark):
    """Blocked+verified pairs == brute-force levenshtein<=1 on random
    surfaces, including the substitution case (meets only at the deleted
    position) and the transposition FALSE POSITIVE ("ab"/"ba" share variants
    but are distance 2 — the verify filter must kill it)."""
    rng = random.Random(20260818)
    vocab = "abcx"
    qs = list({"".join(rng.choice(vocab) for _ in range(rng.randint(2, 5))) for _ in range(60)})
    ds = list({"".join(rng.choice(vocab) for _ in range(rng.randint(2, 5))) for _ in range(60)})
    qs += ["ab", "scan", "vaIue"]
    ds += ["ba", "scat", "value"]
    q = spark.createDataFrame([(s,) for s in qs], "mention string")
    d = spark.createDataFrame([(s,) for s in ds], "surface string")
    got = sorted(
        (r["mention"], r["surface"], r["dist"])
        for r in FZ.fuzzy_surface_candidates(q, d).collect()
    )
    want = sorted(
        (a, b, _lev(a, b))
        for a in set(qs)
        for b in set(ds)
        if _lev(a, b) <= 1 and len(a) >= 2 and len(b) >= 2
    )
    assert got == want and len(got) > 0
    assert ("ab", "ba", 2) not in [(a, b, _lev(a, b)) for a, b, _ in got]
    assert ("scan", "scat", 1) in got and ("vaIue", "value", 1) in got


def test_fuzzy_candidates_plan_has_no_cartesian(spark):
    """The whole point: an equi-join on the variant key, never a nested-loop
    cross join with a levenshtein predicate."""
    q = spark.createDataFrame([("scan",)], "mention string")
    d = spark.createDataFrame([("scat",)], "surface string")
    plan = (
        FZ.fuzzy_surface_candidates(q, d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fuzzy_surface_match_query_survives_degenerate_docs(spark, tmp_path):
    """The driver query's bigram derivation must not ANSI-crash on 0/1-token
    documents (sequence(1, 0) is DESCENDING in Spark, so an unguarded
    transform indexes out of range)."""
    from xlink_spark.driver_queries import q_fuzzy_surface_match

    spark.createDataFrame(
        [
            (1, "hello", "en", "bd", 5),       # one token: no bigram
            (2, "", "en", "bd", 0),            # empty text
            (3, "alpha beta alpha", "en", "wiki", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        (r["mention"], r["surface"])
        for r in q_fuzzy_surface_match(spark, str(tmp_path)).collect()
    }
    # "hello" (unigram, len>=4) corrupted must still match itself at dist 1
    assert any(s == "hello" for _, s in rows)
    assert any(s == "alpha beta" for _, s in rows)  # bigrams still emitted


def test_detect_mentions_fuzzy_finds_typos_with_exact_offsets(spark):
    """Typo'd mentions in text become spans with char-exact offsets and the
    matched dictionary surface; exact hits report dist 0; a surface two
    edits away stays undetected."""
    docs = spark.createDataFrame(
        [
            ("d1", "we visited new yor city yesterday"),  # dropped k: dist 1
            ("d2", "deep learning rules"),
            ("d3", "new yrok is too far"),  # r/o transposition: dist 2
        ],
        "doc_id string, text string",
    )
    dct = spark.createDataFrame(
        [("new york", "ma"), ("deep learning", "ma")],
        "mention string, parse_from string",
    )
    rows = {
        (r["doc_id"], r["start"], r["end"], r["surface"], r["matched_surface"], r["dist"])
        for r in FZ.detect_mentions_fuzzy(docs, dct, max_words=2).collect()
    }
    assert ("d1", 11, 18, "new yor", "new york", 1) in rows
    assert ("d2", 0, 13, "deep learning", "deep learning", 0) in rows
    assert not any(d == "d3" for d, *_ in rows)
    # offsets index the ORIGINAL text
    assert "we visited new yor city yesterday"[11:18] == "new yor"


def test_fuzzy_candidates_min_len_drops_short_surfaces(spark):
    q = spark.createDataFrame([("a",), ("ab",)], "mention string")
    d = spark.createDataFrame([("a",), ("ab",)], "surface string")
    got = {(r["mention"], r["surface"]) for r in FZ.fuzzy_surface_candidates(q, d).collect()}
    assert got == {("ab", "ab")}  # len-1 surfaces gated on BOTH sides
    got3 = FZ.fuzzy_surface_candidates(q, d, min_len=1).count()
    assert got3 == 4  # a~a, a~ab, ab~a, ab~ab all within distance 1


def test_jaro_winkler_micro_classic_values_and_nulls(spark):
    from xlink_spark.operators.fuzzy import jaro_winkler_micro

    rows = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("", ""),
        ("abc", "abc"),
        (None, "abc"),
        ("sream", "sbellyfish"),  # jaro <= 0.7: NO prefix boost
        ("héllo", "hello"),  # UTF-8 BYTES, not code points (duck = 0.84)
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    got = [
        r["jw"]
        for r in df.select(
            jaro_winkler_micro(df["a"], df["b"]).alias("jw")
        ).collect()
    ]
    assert got == [961111, 813333, 896296, 0, 1000000, None, 533333, 840000]


def test_jaro_winkler_micro_bit_parity_with_duckdb(spark):
    """The comparator's convention (boost threshold, prefix cap, empty
    rule) must match DuckDB's jaro_winkler_similarity bit-for-bit so the
    micro-floor never straddles an engine boundary."""
    import math
    import random

    import duckdb

    from xlink_spark.operators.fuzzy import jaro_winkler_micro

    random.seed(11)
    words = ["customer", "custmoer", "martha", "jellyfish", "stream",
             "filter", "column", "vector", "window"]
    pool = ["", "a", "ab"]
    for _ in range(150):
        w = list(random.choice(words))
        op, p = random.randrange(4), random.randrange(len(w))
        if op == 0:
            del w[p]
        elif op == 1:
            w.insert(p, random.choice("abcxyz"))
        elif op == 2:
            w[p] = random.choice("abcxyz")
        elif p + 1 < len(w):
            w[p], w[p + 1] = w[p + 1], w[p]
        pool.append("".join(w))
    pool += ["héllo", "hello", "müller", "muller", "José", "Jose"]
    pairs = [(random.choice(pool), random.choice(pool)) for _ in range(30000)]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["jw"]
        for r in df.select(
            jaro_winkler_micro(df["a"], df["b"]).alias("jw")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("create table p(i bigint, a varchar, b varchar)")
    con.executemany(
        "insert into p values (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
    )
    exp = [
        math.floor(1e6 * v)
        for (v,) in con.execute(
            "select jaro_winkler_similarity(a, b) from p order by i"
        ).fetchall()
    ]
    assert got == exp
