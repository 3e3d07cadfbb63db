"""Fuzzy surface-form matching via deletion-neighborhood blocking.

XLink's blocking key is EXACT surface equality (the trie lookup in
MentionParser.py:53-68 and the dict probes in ProbHolder.py:37-51) — a
misspelled mention ("new yrok") never reaches candidate scoring. This module
adds the standard record-linkage fix at Spark scale: SymSpell-style
deletion-neighborhood blocking.

For edit distance <= 1, two strings match only if their deletion
neighborhoods intersect (the neighborhood of ``s`` is ``{s} ∪ {s minus one
char}``): an insert/delete pair meets at the shorter string, a substitution
pair meets at the string with the differing position deleted. The converse
does NOT hold ("ab" vs "ba" share variants "a" and "b" but are distance 2),
so every blocked pair is verified with one ``levenshtein`` call.

Why this shape at 100 TB: the naive approach is a cross join with a
levenshtein predicate — O(|queries| x |dictionary|) comparisons, unrunnable
at 10^8 surfaces a side. Deletion blocking generates len(s)+1 narrow
(variant, surface) rows per side — output linear in total characters — and
turns matching into one equi-join on ``variant``, with the quadratic blowup
confined to genuine near-collision buckets. The verify filter runs only on
blocked pairs. No UDFs anywhere: variants are built with ``transform`` over
``sequence`` (whole-stage codegen), the verify is the built-in JVM
``levenshtein``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(col: Column | str) -> Column:
    """``{s} ∪ {s with the char at i removed, for every i}`` as an array.

    Duplicate variants (repeated chars: deleting either 'o' of "book" gives
    "bok") are collapsed with ``array_distinct`` so the downstream explode
    doesn't emit redundant join rows.
    """
    s = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(0), F.length(s) - F.lit(1)),
        lambda i: F.concat(s.substr(F.lit(1), i), s.substr(i + F.lit(2), F.length(s))),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def _variant_rows(df: DataFrame, col: str, out: str) -> DataFrame:
    return df.select(
        F.col(col).alias(out),
        F.explode(deletion_variants(F.col(col))).alias("_variant"),
    )


def fuzzy_surface_candidates(
    queries: DataFrame,
    dictionary: DataFrame,
    query_col: str = "mention",
    dict_col: str = "surface",
    min_len: int = 2,
) -> DataFrame:
    """All (query, dictionary) surface pairs within edit distance 1.

    Returns distinct ``(query_col, dict_col, dist)`` rows, ``dist`` in
    {0, 1}. Both inputs are reduced to distinct surfaces first — matching is
    a property of the surface, not of its occurrences, so the join never
    carries occurrence multiplicity (re-attach occurrences afterwards by
    joining back on the surface).

    ``min_len`` drops ultra-short surfaces whose deletion variants are
    near-empty strings — single chars would bucket half the alphabet
    together (the classic SymSpell skew pathology); real blocking keys are
    multi-char surface_norm forms.
    """
    q = queries.select(F.col(query_col).cast("string").alias(query_col)).where(
        F.length(query_col) >= min_len
    ).distinct()
    d = dictionary.select(F.col(dict_col).cast("string").alias(dict_col)).where(
        F.length(dict_col) >= min_len
    ).distinct()
    pairs = (
        _variant_rows(q, query_col, "_q")
        .join(_variant_rows(d, dict_col, "_d"), "_variant")
        .select("_q", "_d")
        .distinct()
    )
    # compute the distance once, then filter on the alias — Filter and
    # Project don't share subexpressions across operator boundaries
    return (
        pairs.select(
            F.col("_q").alias(query_col),
            F.col("_d").alias(dict_col),
            F.levenshtein("_q", "_d").alias("dist"),
        )
        .where(F.col("dist") <= 1)
    )


def detect_mentions_fuzzy(
    docs_plain: DataFrame,
    dictionary: DataFrame,
    max_words: int | None = None,
    min_len: int = 4,
) -> DataFrame:
    """Join-path mention detection tolerant to one edit.

    Composes ``operators.detect.ngram_spans`` (char-exact offsets, no
    dictionary state on executors) with the deletion-neighborhood match:
    every n-gram within edit distance 1 of a dictionary surface becomes a
    mention span — "new yrok city" style typos that exact-match detection
    (the reference's trie walk) drops on the floor.

    The fuzzy match runs on DISTINCT n-gram surfaces, never on occurrences
    — the per-occurrence fan-out happens only in the final equi-join back
    to spans, so corpus size and surface-space size scale independently.
    ``min_len`` is deliberately higher than the matcher's default: one edit
    on a 2-3 char token is mostly noise, and the variant buckets of short
    grams are the skew hotspot.

    Output: (doc_id, start, end, surface, matched_surface, parse_from,
    dist); exact matches report dist 0, so downstream conflict resolution
    can prefer them.
    """
    from xlink_spark.operators.detect import ngram_spans

    mw = {} if max_words is None else {"max_words": max_words}
    grams = ngram_spans(docs_plain, **mw)
    d = dictionary.select(F.col("mention"), "parse_from").distinct()
    pairs = fuzzy_surface_candidates(
        grams.select("surface"),
        d,
        query_col="surface",
        dict_col="mention",
        min_len=min_len,
    )
    matched = pairs.join(d, "mention").select(
        "surface",
        F.col("mention").alias("matched_surface"),
        "parse_from",
        "dist",
    )
    return grams.join(matched, "surface").select(
        "doc_id", "start", "end", "surface", "matched_surface", "parse_from", "dist"
    )


def jaro_winkler_micro(left: Column, right: Column) -> Column:
    """floor(1e6 · JaroWinkler(s1, s2)) as a vectorized Arrow UDF — the
    canonical ER string comparator the built-in function set lacks
    (levenshtein is the only built-in edit metric).

    Convention matches DuckDB's ``jaro_winkler_similarity`` BIT-FOR-BIT
    (pinned by a 30k-pair fuzz test): the comparison runs over UTF-8
    BYTES, not code points (DuckDB scores byte sequences — 'héllo' vs
    'hello' is 0.84, not the code-point 0.88), scaling p = 0.1 over a
    common prefix of ≤ 4 bytes, the Winkler boost applied only when
    jaro > 0.7, either side empty ⇒ 0.0, NULL in ⇒ NULL out. Because the
    doubles are bit-identical, the micro-floor needs no margin
    measurement — the boundary lands identically on both engines.

    This is the sanctioned Python boundary for the comparator: it runs on
    BLOCKED candidate pairs only (SNM / deletion-neighborhood output),
    never a cross product, and each Arrow batch is scored in one pass."""

    def _batch(a, b):
        import math

        import pandas as pd

        def jaro(s1: str, s2: str) -> float:
            l1, l2 = len(s1), len(s2)
            if l1 == 0 or l2 == 0:
                return 0.0
            if s1 == s2:
                return 1.0
            window = max(l1, l2) // 2 - 1
            if window < 0:
                window = 0
            m1 = [False] * l1
            m2 = [False] * l2
            m = 0
            for i in range(l1):
                lo = i - window if i > window else 0
                hi = min(l2, i + window + 1)
                for j in range(lo, hi):
                    if not m2[j] and s1[i] == s2[j]:
                        m1[i] = m2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            k = 0
            for i in range(l1):
                if m1[i]:
                    while not m2[k]:
                        k += 1
                    if s1[i] != s2[k]:
                        t += 1
                    k += 1
            t //= 2
            return (m / l1 + m / l2 + (m - t) / m) / 3.0

        def jw_micro(t1, t2):
            if t1 is None or t2 is None:
                return None
            # UTF-8 bytes, not code points: DuckDB's comparator walks the
            # raw string bytes, so multibyte characters count per byte
            s1, s2 = t1.encode("utf-8"), t2.encode("utf-8")
            j = jaro(s1, s2)
            if j > 0.7:  # Winkler boost threshold (DuckDB convention)
                length = 0
                for x, y in zip(s1[:4], s2[:4]):
                    if x == y:
                        length += 1
                    else:
                        break
                j = j + length * 0.1 * (1.0 - j)
            return math.floor(1e6 * j)

        return pd.Series(
            [jw_micro(x, y) for x, y in zip(a, b)], dtype="object"
        )

    return F.pandas_udf(_batch, "long")(left, right)


def edit_similarity_micro(left: Column | str, right: Column | str) -> Column:
    """Normalized Levenshtein similarity floor(1e6 · (1 − d / max_len)) as a
    pure JVM expression — the scan-speed edit comparator next to the
    Arrow-batched ``jaro_winkler_micro`` (built-in ``levenshtein`` is the
    one edit metric Spark ships; the reference has no inexact comparator at
    all — its probes are exact dict hits, MentionParser.py:53-68).

    Exactness contract: distance and lengths are exact ints; the single
    division is IEEE-754 double (correctly rounded), so for max_len < 2^20
    the quotient is > 1 ulp away from every integer boundary unless exact —
    floor() is bit-identical on any engine evaluating the same expression
    (the DuckDB oracle mirrors it verbatim). Semantics note: Spark's
    levenshtein/length count CODE POINTS while DuckDB's levenshtein counts
    UTF-8 BYTES — identical on ASCII, divergent on multibyte (pinned by
    test); use jaro_winkler_micro (byte semantics) when multibyte parity
    matters. Both sides empty ⇒ 1e6 (identical); NULL in ⇒ NULL out."""
    lc = F.col(left) if isinstance(left, str) else left
    rc = F.col(right) if isinstance(right, str) else right
    d = F.levenshtein(lc, rc)
    mx = F.greatest(F.length(lc), F.length(rc))
    return (
        F.when(lc.isNull() | rc.isNull(), F.lit(None))
        .when(mx == 0, F.lit(1_000_000))
        .otherwise(F.floor((mx - d) * F.lit(1_000_000.0) / mx))
        .cast("long")
    )


def monge_elkan_scores(
    pairs: DataFrame,
    tokens_a: str,
    tokens_b: str,
    id_cols: list[str],
) -> DataFrame:
    """Monge-Elkan hybrid comparator over blocked pairs: the token-level
    generalization of Jaro-Winkler for multi-word fields (names, addresses),
    ME(A→B) = mean over tokens t of A of max over tokens s of B of JW(t,s).

    ``pairs`` must be one row per candidate pair (unique on ``id_cols``)
    with array<string> columns ``tokens_a`` / ``tokens_b``. Returns
    (id_cols..., me_ab_micro, me_ba_micro, me_sym_micro).

    Exact bigint end to end: each token-pair JW is the bit-exact
    ``jaro_winkler_micro`` (DuckDB-identical doubles, so the micro-floor
    needs no margin), per-A-token maxima and the multiplicity-weighted sum
    are bigint ops, and the mean is one integer division — no float ever
    crosses an engine boundary. Duplicate tokens are handled by COUNT
    rather than ordinality (ME sums over token INSTANCES): grouping A's
    tokens to (value, multiplicity) keeps the formula exact and avoids
    posexplode entirely. An empty/NULL token array on either side yields
    NULL for the directions it starves (errors-are-DATA; the pair row
    itself survives via the left-joined spine).

    Scale shape: the token-pair fanout is |A|·|B| per BLOCKED pair — the
    comparator never sees a cross product; only narrow (ids, token) rows
    ride the two aggregations, and the Arrow batch scores each token pair
    once."""
    spine = pairs.select(*id_cols)
    ab = _me_direction(pairs, tokens_a, tokens_b, id_cols, "me_ab_micro")
    ba = _me_direction(pairs, tokens_b, tokens_a, id_cols, "me_ba_micro")
    return (
        spine.join(ab, id_cols, "left")
        .join(ba, id_cols, "left")
        .withColumn(
            "me_sym_micro",
            F.when(
                F.col("me_ab_micro").isNotNull()
                & F.col("me_ba_micro").isNotNull(),
                F.expr("(me_ab_micro + me_ba_micro) div 2"),
            ).cast("long"),
        )
    )


def _me_direction(
    pairs: DataFrame,
    tok_from: str,
    tok_to: str,
    id_cols: list[str],
    out: str,
) -> DataFrame:
    """One Monge-Elkan direction: Σ_t cnt_t · max_s jw_micro(t, s) div Σ cnt."""
    src = pairs.select(*id_cols, F.explode(tok_from).alias("_t")).groupBy(
        *id_cols, "_t"
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    dst = pairs.select(*id_cols, F.explode(tok_to).alias("_s"))
    best = (
        src.join(dst, id_cols)
        .withColumn("_jw", jaro_winkler_micro(F.col("_t"), F.col("_s")))
        .groupBy(*id_cols, "_t", "_cnt")
        .agg(F.max("_jw").alias("_best"))
    )
    return (
        best.groupBy(*id_cols)
        .agg(
            F.sum(F.col("_cnt") * F.col("_best")).cast("long").alias("_sp"),
            F.sum("_cnt").cast("long").alias("_n"),
        )
        .withColumn(out, F.expr("_sp div _n").cast("long"))
        .select(*id_cols, out)
    )


# ------------------------------------------------------------ phonetic keys
# American Soundex as ONE expression pipeline shared by both engines:
# upper/strip → first letter kept → H/W removed from the body (the H/W
# rule: consonants separated only by h/w code as one) → letters→digits via
# translate → the first letter's own code is PREPENDED before the
# adjacent-run collapse (so e.g. "Pfister" codes P236, not P123) → runs
# collapse digit-by-digit (seven chained single-digit replaces — DuckDB's
# RE2 has no pattern backreferences, so no '(\d)\1+') → the first code and
# the vowel zeros drop → pad to 3 digits. Pure translate/substr/concat/
# regexp_replace: whole-stage codegen on Spark, bit-identical text ops on
# DuckDB — no float anywhere, so no margins.
_SDX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY"
_SDX_TO = "111122222222334556000000"


def soundex_key(col: Column | str) -> Column:
    """Classic American Soundex key (e.g. 'Ashcraft' → 'A261') as a pure
    JVM expression chain. Empty/non-alpha input yields '000'."""
    s = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(s, "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    body = F.substring(u, 2, 1 << 30)
    codes = F.translate(F.translate(body, "HW", ""), _SDX_FROM, _SDX_TO)
    fcode = F.translate(first, _SDX_FROM + "HW", _SDX_TO + "00")
    seq = F.concat(fcode, codes)
    for d in "0123456":
        seq = F.regexp_replace(seq, d + "+", d)
    tail = F.translate(F.substring(seq, 2, 1 << 30), "0", "")
    return F.concat(first, F.substring(F.concat(tail, F.lit("000")), 1, 3))


def soundex_sql(expr: str) -> str:
    """The DuckDB rendering of the SAME pipeline, for oracle SQL. Keep in
    lockstep with ``soundex_key`` (pinned by a cross-engine parity test)."""
    u = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    first = f"substr({u}, 1, 1)"
    body = f"substr({u}, 2)"
    codes = f"translate(translate({body}, 'HW', ''), '{_SDX_FROM}', '{_SDX_TO}')"
    fcode = f"translate({first}, '{_SDX_FROM}HW', '{_SDX_TO}00')"
    seq = f"({fcode} || {codes})"
    for d in "0123456":
        seq = f"regexp_replace({seq}, '{d}+', '{d}', 'g')"
    tail = f"translate(substr({seq}, 2), '0', '')"
    return f"({first} || substr({tail} || '000', 1, 3))"


# NYSIIS (Taft 1970), the record-linkage literature's standard companion to
# Soundex (Christen 2006 pairs them): unlike Soundex it keeps vowel
# POSITIONS (collapsed to 'A'), so it separates name shapes Soundex folds
# together, at ~the same per-key cost. Formulated here as a GLOBAL-REWRITE
# chain — one fixed sequence of anchored/global regexp_replace + translate
# steps applied to the whole string — rather than the classic per-position
# scan, so the SAME pipeline renders as a pure whole-stage-codegen Spark
# expression AND a DuckDB oracle expression with no UDF on either side.
# The chain matches the classic scan on the standard published vectors
# (MACINTOSH→MCANT, KNUTH→NAT, PFEISTER→FASTAR, ... — pinned by test); the
# contextual H/W rules see the first character through a vowel-normalized
# one-char prefix, and the classic "append only if != last char of key"
# dedupe is the cross-boundary run collapse. RE2 (DuckDB) has no pattern
# backreferences, so run collapse is 26 chained single-letter replaces and
# the trailing-S / trailing-A rules use '(.)X$' shapes (replacement-side
# backrefs only — Java renders them '$1', RE2 '\\1'). Engine-identical by
# construction; parity pinned by test over real part-name tokens.
#
# Rule order (each step once, in this order):
#   strip non-alpha, upper; head ^MAC→MCC ^KN→NN ^K→C ^PH→FF ^PF→FF
#   ^SCH→SSS; tail (EE|IE)$→Y, (DT|RT|RD|NT|ND)$→D; split first/body;
#   body: EV→AF, EIOU→A, Q→G Z→S M→N, KN→N, K→C, SCH→SSS, PH→FF;
#   scan = vowel-normalized(first) || body: (¬A)H→prev·prev, XH(¬A)→XX(¬A),
#   AW→AA; key = first || scan[2:]; collapse letter runs; (.)S$→\\1;
#   AY$→Y; (.)A+$→\\1; truncate 6 (classic width).
_NYSIIS_HEAD = [
    ("^MAC", "MCC"),
    ("^KN", "NN"),
    ("^K", "C"),
    ("^PH", "FF"),
    ("^PF", "FF"),
    ("^SCH", "SSS"),
]
_NYSIIS_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def nysiis_key(col: Column | str, truncate: int = 6) -> Column:
    """NYSIIS phonetic key (e.g. 'Knuth' → 'NAT') as a pure JVM expression
    chain. Empty/non-alpha input yields ''. ``truncate=0`` keeps the full
    (modified-NYSIIS-style) key width."""
    s = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(s, "[^A-Za-z]", ""))
    for pat, rep in _NYSIIS_HEAD:
        u = F.regexp_replace(u, pat, rep)
    u = F.regexp_replace(u, "(EE|IE)$", "Y")
    u = F.regexp_replace(u, "(DT|RT|RD|NT|ND)$", "D")
    first = F.substring(u, 1, 1)
    body = F.substring(u, 2, 1 << 30)
    body = F.regexp_replace(body, "EV", "AF")
    body = F.translate(F.translate(body, "EIOU", "AAAA"), "QZM", "GSN")
    body = F.regexp_replace(body, "KN", "N")
    body = F.translate(body, "K", "C")
    body = F.regexp_replace(body, "SCH", "SSS")
    body = F.regexp_replace(body, "PH", "FF")
    scan = F.concat(F.translate(first, "EIOU", "AAAA"), body)
    scan = F.regexp_replace(scan, "([^A])H", "$1$1")
    scan = F.regexp_replace(scan, "([A-Z])H([^A])", "$1$1$2")
    scan = F.regexp_replace(scan, "AW", "AA")
    key = F.concat(first, F.substring(scan, 2, 1 << 30))
    for c in _NYSIIS_ALPHA:
        key = F.regexp_replace(key, c + "+", c)
    key = F.regexp_replace(key, "(.)S$", "$1")
    key = F.regexp_replace(key, "AY$", "Y")
    key = F.regexp_replace(key, "(.)A+$", "$1")
    return F.substring(key, 1, truncate) if truncate else key


def nysiis_sql(expr: str, truncate: int = 6) -> str:
    """The DuckDB rendering of the SAME pipeline, for oracle SQL. Keep in
    lockstep with ``nysiis_key`` (pinned by a cross-engine parity test)."""
    u = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    for pat, rep in _NYSIIS_HEAD:
        u = f"regexp_replace({u}, '{pat}', '{rep}')"
    u = f"regexp_replace({u}, '(EE|IE)$', 'Y')"
    u = f"regexp_replace({u}, '(DT|RT|RD|NT|ND)$', 'D')"
    first = f"substr({u}, 1, 1)"
    body = f"substr({u}, 2)"
    body = f"regexp_replace({body}, 'EV', 'AF', 'g')"
    body = f"translate(translate({body}, 'EIOU', 'AAAA'), 'QZM', 'GSN')"
    body = f"regexp_replace({body}, 'KN', 'N', 'g')"
    body = f"translate({body}, 'K', 'C')"
    body = f"regexp_replace({body}, 'SCH', 'SSS', 'g')"
    body = f"regexp_replace({body}, 'PH', 'FF', 'g')"
    scan = f"(translate({first}, 'EIOU', 'AAAA') || {body})"
    scan = f"regexp_replace({scan}, '([^A])H', '\\1\\1', 'g')"
    scan = f"regexp_replace({scan}, '([A-Z])H([^A])', '\\1\\1\\2', 'g')"
    scan = f"regexp_replace({scan}, 'AW', 'AA', 'g')"
    key = f"({first} || substr({scan}, 2))"
    for c in _NYSIIS_ALPHA:
        key = f"regexp_replace({key}, '{c}+', '{c}', 'g')"
    key = f"regexp_replace({key}, '(.)S$', '\\1')"
    key = f"regexp_replace({key}, 'AY$', 'Y')"
    key = f"regexp_replace({key}, '(.)A+$', '\\1')"
    return f"substr({key}, 1, {truncate})" if truncate else key


# Caverphone 2.0 (Hood 2004, "Caverphone Revisited", Caversham Project,
# University of Otago) — the third phonetic scheme next to Soundex and
# NYSIIS (Christen 2006 benchmarks all three): tuned on a real electoral
# roll rather than 1910s census surnames, it keeps MORE context than
# either (vowel positions survive as markers through the consonant rules,
# 'gh'/'ough'/'wh' clusters get dedicated handling) and pads to a fixed
# 10-char width. Unlike Soundex/NYSIIS — which need per-position scans
# reformulated as rewrite chains — Caverphone is PUBLISHED as an ordered
# replacement list, so the dual-engine global-rewrite formulation used by
# this module is the algorithm verbatim, not a reformulation. Digits 2/3
# are the spec's own scratch markers ('2' = delete me, '3' = vowel
# placeholder); uppercase letters are finished output that later
# lowercase-only rules cannot re-touch — which is exactly why the chain
# is confluent under left-to-right non-overlapping global replacement,
# the semantics BOTH Java regex (Spark) and RE2 (DuckDB) implement. No
# pattern backreferences anywhere, so the chain is RE2-safe as written.
_CAVERPHONE_RULES: list[tuple[str, str]] = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]


def caverphone_key(col: Column | str, width: int = 10) -> Column:
    """Caverphone 2.0 key (e.g. 'Stevenson' → 'STFNSN1111', identical to
    'Stephenson') as a pure JVM expression chain. Empty/non-alpha input
    yields the all-pad key '1111111111'. ``width`` is the spec's 10 by
    default; smaller widths coarsen (the Soundex-truncation analogue)."""
    s = F.col(col) if isinstance(col, str) else col
    key = F.lower(F.regexp_replace(s, "[^A-Za-z]", ""))
    for pat, rep in _CAVERPHONE_RULES:
        key = F.regexp_replace(key, pat, rep)
    return F.substring(F.concat(key, F.lit("1" * width)), 1, width)


def caverphone_sql(expr: str, width: int = 10) -> str:
    """The DuckDB rendering of the SAME pipeline, for oracle SQL. Keep in
    lockstep with ``caverphone_key`` (pinned by a cross-engine parity
    test). The 'g' flag matches Spark's replace-all semantics; anchored
    rules have at most one match, so it is inert there."""
    key = f"lower(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    for pat, rep in _CAVERPHONE_RULES:
        key = f"regexp_replace({key}, '{pat}', '{rep}', 'g')"
    return f"substr({key} || '{'1' * width}', 1, {width})"
