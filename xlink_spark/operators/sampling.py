"""Deterministic corpus sampling: hash-Bernoulli, stratified mixing, quotas.

A 100 TB training-data pipeline rarely wants `rand()`-based sampling: the
sample must be REPRODUCIBLE across reruns, partition layouts, and engines
(the same doc must make the same cut every time), and the mixture across
languages/sources/domains must hit a TARGET distribution, not the corpus's
natural skew. Everything here is therefore a pure function of (doc_id,
salt) and integer micro-unit arithmetic:

* ``hash_sample``       — Bernoulli(p) by md5 bucket: one scan-speed filter,
                          no shuffle, no state, safe to push down.
* ``mixture_weights``   — per-stratum keep-rates that reshape the observed
                          stratum counts into a target mixture at the
                          largest achievable total size (the classic
                          dataset-mixing computation, e.g. The Pile /
                          Gopher-style source reweighting).
* ``stratified_hash_sample`` — apply per-stratum rates: broadcast the tiny
                          rate table, filter at scan speed; the corpus is
                          never shuffled.
* ``quota_sample``      — exactly ≤k docs per stratum, chosen by hash rank
                          (deterministic "random k"): one shuffle on the
                          stratum key; an optional counts-driven hash
                          pre-filter keeps the per-stratum sort bounded at
                          head-stratum scale.

Portability: the hash bucket is ``(first 15 hex chars of md5(key)) mod 1e6``
— md5 hex is identical across Spark and DuckDB, 15 hex chars < 2^60 fit a
signed 64-bit int exactly, and both operands are non-negative so Spark's
``pmod`` ≡ SQL ``%``. Rates and shares are integer micro-units (parts per
1e6) combined with integer division only — no float ever decides a
membership, so the oracle check is exact (the convention textstats'
micro-unit fractions established).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) as a pure function of (key, salt).

    The engine-portable deterministic-sampling primitive: DuckDB twin is
    ``('0x' || substr(md5(key || salt), 1, 15))::bigint % 1000000``. Changing
    the salt draws an independent sample (disjoint decisions), which is how
    train/validation splits stay uncorrelated with earlier subsampling.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(key_col.cast("string"), F.lit(salt)))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(MICRO)
    )


def hash_sample(
    docs: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its hash bucket < round(fraction·1e6).

    Reproducible Bernoulli(p): membership depends only on (id, salt), never
    on partitioning, task retries, or row order — unlike ``df.sample``,
    whose per-partition RNG reshuffles membership when the split layout
    changes. Pure scan-speed filter; at 100 TB this is a predicate the
    reader evaluates, not a job. The threshold rounds (not floors) so a
    binary-float fraction like 0.29 → exactly 290000, the same convention
    ``split_thresholds`` uses — external consumers computing the documented
    threshold agree on every bucket.
    """
    return docs.filter(hash_bucket(id_col, salt) < round(fraction * MICRO))


def hash_split(
    docs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash bucket interval.

    The deterministic train/val/test split: ``splits`` maps name → fraction
    (insertion order fixes the bucket intervals), and each row lands in the
    split whose cumulative-threshold interval contains its bucket. Because
    membership is a pure function of (id, salt), the split is stable across
    reruns, partition layouts, and CORPUS GROWTH — adding documents never
    moves an existing document between train and test, which is the
    contamination guarantee a refreshed corpus needs.

    Fractions must be positive and sum to ≤ 1 (+ float tolerance); buckets
    beyond the last threshold get a NULL split (held out). Thresholds are
    integer micro-units computed driver-side, so the same literals embed in
    any engine's CASE expression — exact cross-engine parity.

    Scale shape: one scan-speed CASE over the hash expression; no shuffle,
    no state, safe under column pruning (only ``id_col`` is consulted).
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    if any(f <= 0 for f in splits.values()):
        raise ValueError(f"split fractions must be positive: {splits}")
    total = sum(splits.values())
    if total > 1 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1: {splits}")
    thresholds = split_thresholds(splits)
    prev = 0
    for name, t in thresholds:
        if t <= prev:
            # a fraction below ~5e-7 rounds to a zero-width bucket interval:
            # that split would be silently always-empty (the starvation
            # _mixture_rates' 1ppm share guard exists to prevent)
            raise ValueError(
                f"split '{name}' rounds to an empty bucket interval: {splits}"
            )
        prev = t
    bucket = hash_bucket(id_col, salt)
    col = None
    for name, t in thresholds:
        cond = bucket < F.lit(t)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return docs.withColumn(
        split_col, col.otherwise(F.lit(None).cast("string"))
    )


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative micro-unit upper bounds per split, in insertion order.

    Exposed so an external oracle/consumer can embed the IDENTICAL integer
    literals; rounding happens once, on the cumulative sum (never on the
    parts), so fractions summing to 1.0 always cover the full bucket range.
    """
    out, cum = [], 0.0
    for name, f in splits.items():
        cum += f
        out.append((name, int(round(cum * MICRO))))
    return out


def mixture_weights(
    docs: DataFrame,
    target: dict[str, float],
    stratum_col: str = "lang",
) -> DataFrame:
    """Per-stratum keep-rates that reshape the corpus into ``target``.

    ``target`` maps stratum value → desired share (shares need not sum to
    1; they are normalized in micro-units). The achievable total sample is
    capped by the scarcest stratum relative to its target share:

        T = min_s floor(c_s · 1e6 / share_u_s)      (largest feasible total)
        n_s = share_u_s · T div 1e6                 (per-stratum quota)
        rate_u_s = n_s · 1e6 div c_s                (micro-unit keep-rate)

    All integer division — bit-identical across engines. Strata present in
    the corpus but absent from ``target`` get rate 0 (dropped); a target
    stratum missing from the corpus caps T at 0 — a loud degenerate output
    rather than a silently skewed mixture.

    Scale shape: one map-combinable count per stratum (strata are few); the
    min and the rate arithmetic run on that tiny aggregate, broadcast back.
    """
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    return _mixture_rates(counts, target, stratum_col, "n_docs", "n_target")


def mixture_weights_by(
    docs: DataFrame,
    target: dict[str, float],
    weight_col: str,
    stratum_col: str = "lang",
) -> DataFrame:
    """``mixture_weights`` over an integer per-doc mass instead of doc count.

    The budget that matters for training mixtures is usually TOKENS, not
    documents: stratum mass = sum(weight_col) (e.g. a token count — must be
    integral, the micro-unit arithmetic stays exact), the target reshapes
    token mass, and the emitted ``rate_u`` is still a per-DOC hash keep-rate
    — realized token mass matches the target in expectation because the
    hash bucket is independent of document length. Output columns:
    (stratum, mass, mass_target, rate_u).
    """
    counts = docs.groupBy(stratum_col).agg(
        F.sum(weight_col).cast("long").alias("mass")
    )
    return _mixture_rates(counts, target, stratum_col, "mass", "mass_target")


def _mixture_rates(
    counts: DataFrame,
    target: dict[str, float],
    stratum_col: str,
    mass_col: str,
    target_col: str,
) -> DataFrame:
    """Shared integer micro-unit mixing arithmetic over (stratum, mass)."""
    spark = counts.sparkSession
    total_share = sum(target.values())
    rows = [
        (k, int(v * MICRO / total_share)) for k, v in sorted(target.items())
    ]
    if any(s <= 0 for _, s in rows):
        # a zero micro-unit share would divide by zero in the cap and
        # silently starve the stratum; demand ≥1ppm explicitly instead
        raise ValueError(f"target shares must be >= 1e-6 of total: {rows}")
    shares = spark.createDataFrame(
        rows, f"{stratum_col} string, share_u long"
    )
    # right join keeps target strata with no corpus rows (mass → 0)
    per = counts.join(shares, stratum_col, "right").select(
        stratum_col,
        F.coalesce(mass_col, F.lit(0)).alias(mass_col),
        "share_u",
    )
    # Overflow-safe arithmetic: a naive `mass * 1e6` wraps int64 once a
    # stratum holds > ~9.2e12 tokens — inside the 100 TB design target. The
    # candidate floor(mass·1e6/share) uses the exact decomposition
    #   (m div s)·1e6 + ((m mod s)·1e6) div s        (m mod s < s ≤ 1e6)
    # clamped at CAP when even the decomposed value cannot fit int64
    # (candidate > 9.2e18 micro-mass — such a candidate can only be the
    # min, and therefore inexact, if EVERY stratum exceeds ~9.2e12 tokens
    # per ppm of share: exabyte scale, 5 orders past the design target).
    long_max = (1 << 63) - 1
    cap_quot = long_max // MICRO - 1
    candidate = (
        f"case when {mass_col} div share_u > {cap_quot}"
        f" then {cap_quot * MICRO}"
        f" else ({mass_col} div share_u) * {MICRO}"
        f"      + (({mass_col} % share_u) * {MICRO}) div share_u end"
    )
    cap = per.select(F.min(F.expr(candidate)).alias("t_max"))
    # target = share·t_max div 1e6, decomposed the same way (share ≤ 1e6,
    # t_max ≤ CAP → every term fits); the result is ≤ mass by construction
    target_sql = (
        f"(t_max div {MICRO}) * share_u"
        f" + ((t_max % {MICRO}) * share_u) div {MICRO}"
    )
    return (
        per.join(F.broadcast(cap))
        .select(
            stratum_col,
            mass_col,
            F.expr(target_sql).alias(target_col),
            # rate ≤ 1e6 always fits long; decimal(38,0) holds the ≤1e25
            # numerator and `div` takes the exact integral part
            F.expr(
                f"case when {mass_col} > 0 then"
                f" cast(({target_sql}) as decimal(38,0)) * {MICRO}"
                f" div {mass_col} else 0 end"
            ).alias("rate_u"),
        )
    )


def stratified_hash_sample(
    docs: DataFrame,
    rates: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Apply per-stratum micro-unit keep-rates (a (stratum, rate_u) table).

    The rate table is strata-sized (tiny) — broadcast it and the corpus is
    filtered in place: no shuffle, no skew surface, compatible with column
    pruning (only id + stratum are consulted). Rows whose stratum has no
    rate row are dropped (inner join ≡ rate 0).
    """
    return docs.join(
        F.broadcast(rates.select(stratum_col, "rate_u")), stratum_col
    ).filter(hash_bucket(id_col, salt) < F.col("rate_u")).drop("rate_u")


def quota_sample(
    docs: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    prefilter_counts: DataFrame | None = None,
    oversample: int = 4,
) -> DataFrame:
    """Exactly min(k, |stratum|) docs per stratum, by ascending hash bucket.

    Deterministic "pick k at random": rank docs within each stratum by
    (hash_bucket, id) and keep rank ≤ k — same k docs on every engine and
    every rerun. One shuffle on the stratum key.

    At head-stratum scale (one stratum ≫ k) sorting the whole stratum to
    keep k rows is waste; pass ``prefilter_counts`` (a (stratum, n_docs)
    frame, e.g. from ``mixture_weights`` input stats) and the corpus is
    first thinned with the SAME hash at rate ``oversample·k / n_s`` before
    the window. Because the pre-filter keeps exactly the rows with the
    SMALLEST buckets' range (bucket < r), the top-k-by-bucket of the
    survivors equals the global top-k whenever ≥ k rows survive — with a
    4× oversample the shortfall probability is Chernoff-negligible
    (≈ exp(-0.57·k)), and the identity is pinned by test, not assumed.
    """
    ranked_src = docs
    if prefilter_counts is not None:
        rates = prefilter_counts.select(
            stratum_col,
            F.least(
                F.lit(MICRO),
                F.expr(f"{int(oversample * k) * MICRO} div n_docs"),
            ).alias("rate_u"),
        )
        # left join: a stratum absent from the counts frame (e.g. a source
        # added after the stats snapshot) gets NO thinning rather than
        # silent deletion — the exact-k contract holds for unknown strata
        ranked_src = docs.join(
            F.broadcast(rates), stratum_col, "left"
        ).filter(
            hash_bucket(id_col, salt)
            < F.coalesce(F.col("rate_u"), F.lit(MICRO))
        ).drop("rate_u")
    w = (
        F.row_number()
        .over(
            Window.partitionBy(stratum_col).orderBy(
                hash_bucket(id_col, salt), F.col(id_col)
            )
        )
        .alias("_rk")
    )
    return (
        ranked_src.select("*", w)
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
