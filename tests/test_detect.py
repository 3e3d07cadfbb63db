"""Detection + conflict resolution + salted blocking join (J1, W1/W2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xlink_spark.operators import detect as DT


def test_detect_longest_match_and_offsets(spark):
    sd = {"deep learning": (2, "ma"), "learning": (1, "ma"), "graph": (1, "ma")}
    docs = spark.createDataFrame(
        [("d1", "We study Deep Learning and graph theory")],
        "doc_id string, text string",
    )
    got = sorted(
        (r["start"], r["end"], r["surface"]) for r in DT.detect_mentions(docs, sd).collect()
    )
    text = "We study Deep Learning and graph theory"
    # all matches are emitted, including "learning" starting INSIDE
    # "deep learning" — resolve_conflicts picks winners, not the scanner
    assert got == [
        (text.index("Deep"), text.index("Deep") + len("deep learning"), "deep learning"),
        (text.index("Learning"), text.index("Learning") + len("learning"), "learning"),
        (text.index("graph"), text.index("graph") + 5, "graph"),
    ]


def test_detect_emits_overlapping_matches(spark):
    # a match beginning inside an earlier match IS emitted (the reference
    # trie emits all matches, MentionParser.py:53-68); solve_conflict picks
    # the winner. With "new york" + "york city" over "new york city", the
    # longer "york city" must be able to win.
    sd = {"new york": (2, "ma"), "york city": (2, "ma")}
    docs = spark.createDataFrame([("d1", "new york city")], "doc_id string, text string")
    raw = sorted(r["surface"] for r in DT.detect_mentions(docs, sd).collect())
    assert raw == ["new york", "york city"]
    won = [r["surface"] for r in DT.resolve_conflicts(DT.detect_mentions(docs, sd)).collect()]
    assert won == ["york city"]  # longest surface wins the overlap group


def test_detect_empty_and_nomatch_docs(spark):
    sd = {"x": (1, "ma")}
    docs = spark.createDataFrame(
        [("d1", ""), ("d2", "nothing here"), ("d3", "x marks")],
        "doc_id string, text string",
    )
    got = DT.detect_mentions(docs, sd).collect()
    assert [(r["doc_id"], r["surface"]) for r in got] == [("d3", "x")]


def test_resolve_conflicts_longest_wins(spark):
    # spans: [0,5) [3,9) [8,12) are one transitive group; [20,25) separate
    rows = [
        ("d", 0, 5, "aaaaa", "ma"),
        ("d", 3, 9, "bbbbbb", "ma"),
        ("d", 8, 12, "cccc", "ma"),
        ("d", 20, 25, "eeeee", "ma"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, start int, end int, surface string, parse_from string")
    got = sorted((r["start"], r["surface"]) for r in DT.resolve_conflicts(df).collect())
    assert got == [(3, "bbbbbb"), (20, "eeeee")]


def test_resolve_conflicts_weighted_ma_beats_tt(spark):
    rows = [
        ("d", 0, 4, "tttt", "tt"),
        ("d", 2, 5, "mmm", "ma"),  # shorter but higher weight
    ]
    df = spark.createDataFrame(rows, "doc_id string, start int, end int, surface string, parse_from string")
    got = [(r["surface"], r["parse_from"]) for r in DT.resolve_conflicts(df, weighted=True).collect()]
    assert got == [("mmm", "ma")]
    # unweighted: longest wins
    got2 = [r["surface"] for r in DT.resolve_conflicts(df, weighted=False).collect()]
    assert got2 == ["tttt"]


def test_salted_join_equals_plain_join(spark):
    mentions = spark.createDataFrame(
        [("d%d" % i, i, i + 5, "China", "ma") for i in range(50)]
        + [("dx", 0, 4, "rare", "ma")],
        "doc_id string, start int, end int, surface string, parse_from string",
    )
    anchors = spark.createDataFrame(
        [("china", "e%d" % k, k + 1) for k in range(70)] + [("rare", "e9", 2)],
        "mention string, entity_id string, cnt long",
    )
    plain = DT.candidate_join(mentions, anchors)
    hot = DT.hot_keys(anchors, min_candidates=64)
    assert [r["mention"] for r in hot.collect()] == ["china"]
    salted = DT.candidate_join(mentions, anchors, hot=hot, n_salt=4)
    key = lambda df: sorted(
        (r["doc_id"], r["start"], r["entity_id"], r["cnt"]) for r in df.collect()
    )
    assert key(plain) == key(salted)
    assert plain.count() == 50 * 70 + 1


def test_join_path_detection_equals_broadcast_path(spark):
    """detect_mentions_join (dictionary-as-table, the big-dictionary path)
    must produce the same post-resolve_conflicts winners as the broadcast
    scanner on the same corpus."""
    sd = {
        "deep learning": (2, "ma"), "learning": (1, "ma"), "graph": (1, "ma"),
        "new york": (2, "ma"), "york city": (2, "ma"), "x": (1, "ma"),
    }
    docs = spark.createDataFrame(
        [
            ("d1", "We study Deep Learning and graph theory"),
            ("d2", "new york city has deep  learning labs"),  # double space: no match
            ("d3", ""),
            ("d4", "x marks the spot x"),
        ],
        "doc_id string, text string",
    )
    dict_df = spark.createDataFrame(
        [(s, pf) for s, (_, pf) in sd.items()], "mention string, parse_from string"
    )
    key = lambda df: sorted(
        (r["doc_id"], r["start"], r["end"], r["surface"], r["parse_from"])
        for r in DT.resolve_conflicts(df).collect()
    )
    bcast = key(DT.detect_mentions(docs, sd))
    joined = key(DT.detect_mentions_join(docs, dict_df))
    assert bcast == joined and len(bcast) > 0
    # the double-space doc matched "new york city"'s pieces but NOT the
    # space-normalized bigram "deep learning" — on BOTH paths
    assert not any(s == "deep learning" and d == "d2" for d, _, _, s, _ in bcast)
