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


def test_edit_similarity_micro_known_and_nulls(spark):
    """floor(1e6·(1−d/max_len)): known distances, both-empty ⇒ 1e6,
    NULL ⇒ NULL — and the double-division floor equals exact integer
    division (the bit-identity the oracle relies on)."""
    rows = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("", ""), ("a", None), ("ab", "")],
        "a string, b string",
    ).select(FZ.edit_similarity_micro("a", "b").alias("s")).collect()
    # kitten/sitting: d=3, max=7 -> (4*1e6) // 7
    assert [r["s"] for r in rows] == [
        4_000_000 // 7, 1_000_000, 1_000_000, None, 0
    ]


def test_edit_similarity_micro_matches_duckdb_ascii_and_diverges_multibyte(spark):
    """Fuzzed ASCII parity with DuckDB's levenshtein (the oracle's engine)
    — and the DOCUMENTED divergence on multibyte input: Spark counts code
    points, DuckDB bytes (why multibyte comparisons belong to
    jaro_winkler_micro, which pins byte semantics)."""
    import duckdb

    rng = random.Random(20260818)
    vocab = "abcdeF#012"
    pairs = [
        (
            "".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))),
            "".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))),
        )
        for _ in range(300)
    ]
    got = spark.createDataFrame(pairs, "a string, b string").select(
        FZ.edit_similarity_micro("a", "b").alias("s")
    ).collect()
    con = duckdb.connect()
    for (a, b), r in zip(pairs, got):
        [(exp,)] = con.execute(
            "select case when greatest(length(?), length(?)) = 0 then 1000000"
            " else floor(((greatest(length(?), length(?)) - levenshtein(?, ?))"
            " * 1000000.0) / greatest(length(?), length(?)))::bigint end",
            [a, b, a, b, a, b, a, b],
        ).fetchall()
        assert r["s"] == exp, (a, b)
    # multibyte divergence pinned: 'héllo' vs 'hello'
    [r] = spark.createDataFrame([("héllo", "hello")], "a string, b string").select(
        FZ.edit_similarity_micro("a", "b").alias("s")
    ).collect()
    assert r["s"] == 800_000  # code points: d=1, max=5
    [(dd,)] = con.execute(
        "select floor(((greatest(length(a), length(b)) - levenshtein(a, b))"
        " * 1000000.0) / greatest(length(a), length(b)))::bigint"
        " from (select 'héllo' as a, 'hello' as b)"
    ).fetchall()
    assert dd != 800_000  # DuckDB walks bytes: d=2


def _jw_micro_py(a: str, b: str) -> int:
    import math

    s1, s2 = a.encode(), b.encode()

    def jaro(x, y):
        l1, l2 = len(x), len(y)
        if l1 == 0 or l2 == 0:
            return 0.0
        if x == y:
            return 1.0
        w = max(max(l1, l2) // 2 - 1, 0)
        m1, m2, m = [False] * l1, [False] * l2, 0
        for i in range(l1):
            for j in range(max(0, i - w), min(l2, i + w + 1)):
                if not m2[j] and x[i] == y[j]:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if x[i] != y[k]:
                    t += 1
                k += 1
        t //= 2
        return (m / l1 + m / l2 + (m - t) / m) / 3.0

    j = jaro(s1, s2)
    if j > 0.7:
        ln = 0
        for x, y in zip(s1[:4], s2[:4]):
            if x != y:
                break
            ln += 1
        j += ln * 0.1 * (1.0 - j)
    return math.floor(1e6 * j)


def test_monge_elkan_matches_brute_force(spark):
    """ME over random token arrays (duplicates included) == the brute
    instance-level mean-of-max in exact integers; empty side ⇒ NULL for
    the starved directions (errors-are-DATA)."""
    rng = random.Random(7)
    words = ["customer", "custmer", "smith", "smyth", "001", "002", "0021", ""]
    pairs = []
    for i in range(40):
        ta = [rng.choice(words) for _ in range(rng.randint(0, 4))]
        tb = [rng.choice(words) for _ in range(rng.randint(0, 4))]
        pairs.append((i, i + 1000, ta, tb))
    pdf = spark.createDataFrame(
        pairs, "id_a long, id_b long, ta array<string>, tb array<string>"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["me_ab_micro"], r["me_ba_micro"], r["me_sym_micro"])
        for r in FZ.monge_elkan_scores(pdf, "ta", "tb", ["id_a", "id_b"]).collect()
    }
    assert len(got) == len(pairs)

    def me(A, B):
        if not A or not B:
            return None
        return sum(max(_jw_micro_py(t, s) for s in B) for t in A) // len(A)

    for ia, ib, ta, tb in pairs:
        eab, eba = me(ta, tb), me(tb, ta)
        esym = (eab + eba) // 2 if eab is not None and eba is not None else None
        assert got[(ia, ib)] == (eab, eba, esym), (ta, tb)
