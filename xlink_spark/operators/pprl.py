"""Privacy-preserving record linkage: Bloom-filter encodings (Schnell,
Bachteler & Reiher, BMC MIC 2009) — the standard PPRL building block.

Identifiers never leave their silo in the clear: each party maps its
quasi-identifier strings to padded character bigrams, hashes every bigram
into a fixed-width Bloom bitvector with k double-hashed positions
(Kirsch-Mitzenmatcher h1 + i·h2, the Schnell convention), and only the
bitvectors are exchanged. Similar strings share most bigrams, so their
filters share most set bits, and the DICE coefficient over the bitvectors
approximates the bigram Dice of the cleartext — linkage proceeds without
revealing names.

Engine-portable by construction: hashes come from md5 hex (both engines
agree byte-for-byte), bitvectors are arrays of 64-bit words combined with
bit_or / bit_and / bit_count — pure integer ops, no floats anywhere; the
Dice score is a floored parts-per-thousand integer.

Scale shape: encoding is one narrow explode (≈ len(s)·k positions per
record) + a map-combinable bit_or groupBy; scoring touches ONLY blocked
candidate pairs and each comparison is m/64 word AND-popcounts — the
cheapest comparator in the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_encode(
    records: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    m_bits: int = 256,
    k: int = 4,
) -> DataFrame:
    """(id, text) → (id, w0..w{m/64-1}, nbits): the Schnell CLK encoding.

    Padded bigrams of lower(text) ('_abc_' → '_a','ab','bc','c_'), each
    hashed to k positions pos_i = (h1 + i·h2) mod m where h1/h2 are the
    first/second 8 md5 hex digits of the bigram — deterministic and
    identical on any engine. ``nbits`` is the filter's popcount (the Dice
    denominator contribution, precomputed so scoring never re-pops the
    whole vector). m_bits must be a multiple of 64.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    words = m_bits // 64
    padded = F.concat(F.lit("_"), F.lower(F.col(text_col)), F.lit("_"))
    grams = (
        records.select(F.col(id_col).alias("id"), padded.alias("_pad"))
        .select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(_pad) - 1, 1)),"
                    " i -> substring(_pad, i, 2))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    hashed = grams.select(
        "id",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5("gram"), 9, 8), 16, 10)
        .cast("long")
        .alias("h2"),
    )
    pos = hashed.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {k - 1}),"
                f" i -> pmod(h1 + i * h2, {m_bits}))"
            )
        ).alias("pos"),
    ).distinct()
    word_exprs = [
        F.coalesce(
            F.bit_or(
                F.when(
                    F.expr(f"pos div 64") == w,
                    F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias(f"w{w}")
        for w in range(words)
    ]
    enc = pos.groupBy("id").agg(*word_exprs)
    nbits = sum(
        (F.bit_count(F.col(f"w{w}")).cast("long") for w in range(words)),
        F.lit(0).cast("long"),
    )
    return enc.select("id", *[f"w{w}" for w in range(words)], nbits.alias("nbits"))


def bloom_dice_scores(
    pairs: DataFrame,
    encodings: DataFrame,
    m_bits: int = 256,
) -> DataFrame:
    """(id_a, id_b) blocked pairs × CLK encodings → Dice similarity:
    one row per pair with ``common_bits``, ``nbits_a``, ``nbits_b`` and
    ``dice_ppt = floor(1000 · 2·|A∧B| / (|A|+|B|))`` (0 when both filters
    are empty). Pure word-wise AND + popcount — no floats."""
    words = m_bits // 64
    ea = encodings.select(
        F.col("id").alias("id_a"),
        *[F.col(f"w{w}").alias(f"a{w}") for w in range(words)],
        F.col("nbits").alias("nbits_a"),
    )
    eb = encodings.select(
        F.col("id").alias("id_b"),
        *[F.col(f"w{w}").alias(f"b{w}") for w in range(words)],
        F.col("nbits").alias("nbits_b"),
    )
    common = sum(
        (
            F.bit_count(F.expr(f"a{w} & b{w}")).cast("long")
            for w in range(words)
        ),
        F.lit(0).cast("long"),
    )
    return (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            common.alias("common_bits"),
            "nbits_a",
            "nbits_b",
        )
        .select(
            "*",
            F.expr(
                "case when nbits_a + nbits_b > 0 then"
                " (2000 * common_bits) div (nbits_a + nbits_b)"
                " else 0 end"
            )
            .cast("long")
            .alias("dice_ppt"),
        )
    )


def hlsh_positions(
    bands: int = 6, bits_per_band: int = 10, m_bits: int = 256
) -> list[list[int]]:
    """Deterministic Hamming-LSH bit-position sample: band b, slot j reads
    bit md5("hlsh_{b}_{j}") mod m — pure stdlib, so the Spark plan and the
    SQL oracle inline the SAME literal positions (no engine hashing
    involved at plan time)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"hlsh_{b}_{j}".encode()).hexdigest()[:8], 16)
            % m_bits
            for j in range(bits_per_band)
        ]
        for b in range(bands)
    ]


def hlsh_candidate_pairs(
    encodings: DataFrame,
    bands: int = 6,
    bits_per_band: int = 10,
    m_bits: int = 256,
) -> DataFrame:
    """Hamming-LSH blocking over CLK encodings (Durham et al.'s PPRL
    blocking): band b packs ``bits_per_band`` fixed sampled bits of the
    Bloom filter into a bucket key; records agreeing on ALL sampled bits
    of ANY band become a candidate pair — so blocking runs on the
    ENCODINGS, never on cleartext, completing the privacy-preserving
    pipeline (encode → HLSH block → Dice verify). Near-identical filters
    flip few bits, so they collide in some band with high probability
    (the standard banded-LSH recall curve); candidates are verified by
    exact Dice downstream, so band misses are the only recall loss.

    Returns distinct (id_a < id_b) candidate pairs. Scale shape: one
    narrow (id, band, bucket) projection + a bucket equi-join — the
    simhash_near_pairs shape; arithmetic-only bit extraction
    ((word >> s) & 1 — both engines shift negatives arithmetically,
    parity-tested)."""
    pos = hlsh_positions(bands, bits_per_band, m_bits)
    bucket_rows = []
    for b, plist in enumerate(pos):
        parts = [
            f"((shiftright(w{p // 64}, {p % 64}) & 1) << {j})"
            for j, p in enumerate(plist)
        ]
        bucket_rows.append(
            f"struct({b}L as band, cast({' + '.join(parts)} as bigint)"
            " as bucket)"
        )
    keyed = encodings.select(
        "id",
        F.explode(F.expr(f"array({', '.join(bucket_rows)})")).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = keyed.select(
        F.col("id").alias("id_a"), "band", "bucket"
    )
    b2 = keyed.select(
        F.col("id").alias("id_b"), "band", "bucket"
    )
    return (
        a.join(b2, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
