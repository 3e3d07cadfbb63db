"""B-cubed clustering precision / recall / F1 — the record-linkage
community's standard cluster-quality metric (Bagga & Baldwin 1998).

The reference evaluates mention-level micro F1 only
(MentionParsingEval.py:12-69); an entity-resolution engine whose final
product is transitive CLUSTERS (north rule: blocking → pairwise scoring →
transitive clustering) needs the cluster-grain gauge too. Per item i,
B³-precision(i) = |pred(i) ∩ gold(i)| / |pred(i)| and B³-recall(i) swaps
the denominator; the reported numbers are the means over items.

Scale shape — identical to eval/blocking.py: both means are pure functions
of GROUP SIZES. Every item in the (pred=p, gold=g) contingency cell of
size n_pg shares pred-cluster size n_p and gold-cluster size n_g, so

    B³P = (1/N) Σ_cells n_pg² / n_p      B³R = (1/N) Σ_cells n_pg² / n_g

— three map-side-combinable groupBy counts plus two narrow (key, count)
equi-joins; no pair or item-pair is ever materialized, so the job is
linear in records even when clusters hold 10⁶ members.

Exactness: each cell contributes floor(n_pg² · 10⁶ / n_den) in bigint
arithmetic, the contributions are summed, and the mean is one more integer
division — sum-of-floors is the DOCUMENTED semantics, bit-identical on any
engine (no float ever crosses an engine boundary). F1 is the harmonic mean
of the two floored micro values, again in integers. The bigint bound:
n_pg² · 10⁶ < 2⁶³ requires n_pg ≤ ~3·10⁶ items per contingency cell;
beyond that, run over a deterministic hash-sample (operators/sampling.py)
— the metrics are ratios of group-size moments, so they are sample-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def bcubed(
    records: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """One-row frame of B-cubed metrics over (pred, gold) labeled items.

    Input: one row per item with its predicted cluster id and gold cluster
    id (both non-null; callers filter first). Output columns:
    ``n_items n_pred_clusters n_gold_clusters bcubed_p_micro
    bcubed_r_micro bcubed_f_micro`` — all micro values floor(x·10⁶) via
    integer sum-of-floors (see module docstring). Empty input reports the
    vacuous 10⁶ for all three, mirroring eval/blocking.py's convention.
    """
    r = records.select(F.col(pred_col).alias("p"), F.col(gold_col).alias("g"))
    cells = r.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n_pg"))
    preds = r.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    golds = r.groupBy("g").agg(F.count(F.lit(1)).alias("n_g"))
    j = cells.join(preds, "p").join(golds, "g")

    _z = lambda c: F.coalesce(c, F.lit(0))  # empty input ⇒ 0, not NULL
    agg = j.agg(
        _z(F.sum("n_pg")).cast("long").alias("n_items"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        _z(F.sum(F.expr(f"n_pg * n_pg * {_MICRO} div n_p")))
        .cast("long")
        .alias("psum"),
        _z(F.sum(F.expr(f"n_pg * n_pg * {_MICRO} div n_g")))
        .cast("long")
        .alias("rsum"),
    )
    counts = (
        preds.agg(F.count(F.lit(1)).cast("long").alias("n_pred_clusters"))
        .crossJoin(
            golds.agg(F.count(F.lit(1)).cast("long").alias("n_gold_clusters"))
        )
    )
    out = agg.crossJoin(counts).select(
        "n_items",
        "n_pred_clusters",
        "n_gold_clusters",
        F.when(F.col("n_items") > 0, F.expr("psum div n_items"))
        .otherwise(F.lit(_MICRO))
        .cast("long")
        .alias("bcubed_p_micro"),
        F.when(F.col("n_items") > 0, F.expr("rsum div n_items"))
        .otherwise(F.lit(_MICRO))
        .cast("long")
        .alias("bcubed_r_micro"),
    )
    return out.select(
        "*",
        F.when(
            F.col("bcubed_p_micro") + F.col("bcubed_r_micro") > 0,
            F.expr(
                "2 * bcubed_p_micro * bcubed_r_micro"
                " div (bcubed_p_micro + bcubed_r_micro)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bcubed_f_micro"),
    )


def adjusted_rand(
    assignments: DataFrame,
    *,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Adjusted Rand Index between two clusterings of the same items —
    the chance-corrected pair-counting metric completing the cluster-gauge
    trio next to B³ (this module) and pairwise F1 (operators/linkage):
    pairwise F1 scores only LABELED candidate pairs, B³ is item-averaged;
    ARI scores ALL C(n,2) implicit pairs with agreement-by-chance removed.

    ``assignments``: one row per item with ``pred_col`` / ``gold_col``
    labels (caller resolves singleton conventions first). Returns ONE row:
    n, sum_ij = Σ_cells C(n_ij,2), sum_a / sum_b (same over pred / gold
    marginals), c2 = C(n,2), and the exact-bigint rational

        ari_num = 2 · (c2·sum_ij − sum_a·sum_b)
        ari_den = c2·(sum_a + sum_b) − 2·sum_a·sum_b

    plus ``ari`` = ari_num / ari_den as ONE double division of two exact
    bigints — correctly rounded, hence bit-identical cross-engine (NULL
    when ari_den = 0, i.e. both clusterings are all-singletons or one
    cluster covers everything on both sides — ARI is undefined there).

    Scale shape: three map-combinable group counts (cell, pred marginal,
    gold marginal) over (pred, gold) label rows — no pair is ever
    materialized, so the job is linear in items. Bigint bound: c2·sum_ij
    < 2⁶³ holds through n ≈ 3·10⁹ items; past that, run over a
    deterministic hash-sample (the metric is a ratio of pair-count
    moments, sample-stable) — the B³ precedent."""
    lab = assignments.select(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    )

    def _c2(cnt):
        return F.coalesce(
            F.sum(F.expr(f"({cnt} * ({cnt} - 1)) div 2")), F.lit(0)
        ).cast("long")

    cells = (
        lab.groupBy("_p", "_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(_c2("_n").alias("sum_ij"), F.sum("_n").cast("long").alias("n"))
    )
    rows_ = (
        lab.groupBy("_p")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(_c2("_n").alias("sum_a"))
    )
    cols_ = (
        lab.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(_c2("_n").alias("sum_b"))
    )
    one = cells.crossJoin(F.broadcast(rows_)).crossJoin(F.broadcast(cols_))
    return one.select(
        "n",
        "sum_ij",
        "sum_a",
        "sum_b",
        F.expr("(n * (n - 1)) div 2").cast("long").alias("c2"),
    ).select(
        "n",
        "sum_ij",
        "sum_a",
        "sum_b",
        "c2",
        (F.lit(2) * (F.col("c2") * F.col("sum_ij") - F.col("sum_a") * F.col("sum_b")))
        .cast("long")
        .alias("ari_num"),
        (
            F.col("c2") * (F.col("sum_a") + F.col("sum_b"))
            - F.lit(2) * F.col("sum_a") * F.col("sum_b")
        )
        .cast("long")
        .alias("ari_den"),
    ).withColumn(
        "ari",
        F.when(
            F.col("ari_den") != 0,
            F.col("ari_num").cast("double") / F.col("ari_den").cast("double"),
        ),
    )


def vmeasure(
    assignments: DataFrame,
    *,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """V-measure (Rosenberg & Hirschberg): the entropy-based cluster gauge
    completing the family — pairwise F1 (labeled pairs), B³ (item-
    averaged), ARI (all pairs, chance-corrected), V (information-
    theoretic: homogeneity × completeness).

    Every entropy is a sum of per-cell bigint micro-floors (the PSI
    precedent): term = floor(1e6 · n_cell · ln(marginal / n_cell) / N),
    written with IDENTICAL operation order in Spark and the SQL oracle —
    each term is one ln + correctly-rounded double arithmetic, so the only
    cross-engine risk is ln's ulp under the floor, margin-measured before
    the oracle ships; the bigint SUM of floors is order-independent, so
    partial aggregation never changes the result. Then

        homogeneity  h = 1 − H(gold|pred)/H(gold)   (1 when H(gold) = 0)
        completeness c = 1 − H(pred|gold)/H(pred)   (1 when H(pred) = 0)
        v            = 2hc / (h + c)                (0 when h + c = 0)

    Caveat: the H = 0 branch fires on the MICRO-FLOORED sum, so a
    near-degenerate marginal whose every term floors to zero (e.g. one
    gold class of n−1 plus a singleton at n ≈ 10⁸ — true entropy ≈ 2e-7)
    saturates h (or c) to exactly 1. Cross-engine consistent (the oracle
    floors identically); if sub-µ entropies matter, raise the µ scale.

    from the exact bigint micro sums — single correctly-rounded double
    divisions, bit-identical cross-engine. ONE output row carries the four
    exact entropy sums plus the three derived doubles.

    Scale shape: three map-combinable group counts (cell, pred marginal,
    gold marginal) + two narrow marginal joins back onto the cell table —
    no pair materialized, linear in items, the ARI shape exactly."""
    lab = assignments.select(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    )
    cells = lab.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("n_ck"))
    pk = lab.groupBy("_p").agg(F.count(F.lit(1)).alias("n_k"))
    gk = lab.groupBy("_g").agg(F.count(F.lit(1)).alias("m_c"))
    n_total = lab.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def _term(cnt: str, marg: str) -> F.Column:
        # floor((1e6 * cnt * ln(marg / cnt)) / n) — keep this exact
        # operation order in lockstep with the SQL oracle
        return F.floor(
            (
                F.lit(1000000.0)
                * F.col(cnt).cast("double")
                * F.log(F.col(marg).cast("double") / F.col(cnt).cast("double"))
            )
            / F.col("n").cast("double")
        ).cast("long")

    joined = (
        cells.join(pk, "_p").join(gk, "_g").crossJoin(F.broadcast(n_total))
    )
    conds = joined.agg(
        F.coalesce(F.sum(_term("n_ck", "n_k")), F.lit(0))
        .cast("long")
        .alias("h_gold_given_pred_micro"),
        F.coalesce(F.sum(_term("n_ck", "m_c")), F.lit(0))
        .cast("long")
        .alias("h_pred_given_gold_micro"),
    )
    h_gold = (
        gk.crossJoin(F.broadcast(n_total))
        .agg(F.coalesce(F.sum(_term("m_c", "n")), F.lit(0)).cast("long"))
        .toDF("h_gold_micro")
    )
    h_pred = (
        pk.crossJoin(F.broadcast(n_total))
        .agg(F.coalesce(F.sum(_term("n_k", "n")), F.lit(0)).cast("long"))
        .toDF("h_pred_micro")
    )
    one = (
        n_total.crossJoin(F.broadcast(conds))
        .crossJoin(F.broadcast(h_gold))
        .crossJoin(F.broadcast(h_pred))
    )
    h = F.when(F.col("h_gold_micro") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.col("h_gold_given_pred_micro").cast("double")
        / F.col("h_gold_micro").cast("double")
    )
    c = F.when(F.col("h_pred_micro") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.col("h_pred_given_gold_micro").cast("double")
        / F.col("h_pred_micro").cast("double")
    )
    one = one.select(
        "n",
        "h_gold_given_pred_micro",
        "h_gold_micro",
        "h_pred_given_gold_micro",
        "h_pred_micro",
        h.alias("homogeneity"),
        c.alias("completeness"),
    )
    v = F.when(
        F.col("homogeneity") + F.col("completeness") == 0, F.lit(0.0)
    ).otherwise(
        F.lit(2.0)
        * F.col("homogeneity")
        * F.col("completeness")
        / (F.col("homogeneity") + F.col("completeness"))
    )
    return one.select("*", v.alias("v_measure"))


def muc(
    assignments: DataFrame,
    *,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """MUC link-based precision / recall / F1 (Vilain et al. 1995) — the
    original coreference/ER cluster metric, completing the gauge family
    next to pairwise F1 (labeled pairs), B³ (item-averaged), ARI (all
    pairs, chance-corrected), and V (entropy): MUC counts the MINIMUM
    spanning links a clustering gets right, so it measures "how many merge
    decisions were correct" and — unlike B³ — is insensitive to cluster
    size imbalance (its known blind spot: it cannot reward correctly
    isolated singletons, which is why the family carries all five gauges).

        recall    = Σ_g (n_g − parts(g)) / Σ_g (n_g − 1)
        precision = Σ_p (n_p − parts(p)) / Σ_p (n_p − 1)

    where parts(g) = number of distinct pred clusters intersecting gold
    cluster g (and symmetrically for precision) — for fully-labeled input
    that is exactly the count of nonzero contingency cells in g's row.

    Exactness: the four sums are pure bigint counts (no floats anywhere);
    micro values are floor(num · 10⁶ / den) single integer divisions, and
    F1 is the harmonic mean of the two micros in integers — bit-identical
    on any engine. A zero denominator (that side is all singletons: no
    links to get right) reports the vacuous 10⁶, the module's convention.

    Scale shape: the B³ shape exactly — one (pred, gold) cell count and
    two marginal counts, all map-side combinable; parts(·) per marginal is
    a count over cell rows, never a pair; linear in items."""
    r = assignments.select(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    )
    cells = r.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("n_pg"))
    # per gold cluster: size and the number of pred parts it shatters into
    by_g = cells.groupBy("_g").agg(
        F.sum("n_pg").alias("n_g"), F.count(F.lit(1)).alias("parts_g")
    )
    by_p = cells.groupBy("_p").agg(
        F.sum("n_pg").alias("n_p"), F.count(F.lit(1)).alias("parts_p")
    )
    _z = lambda c: F.coalesce(c, F.lit(0)).cast("long")
    rsums = by_g.agg(
        _z(F.sum("n_g")).alias("n_items"),
        _z(F.sum(F.col("n_g") - F.col("parts_g"))).alias("muc_r_num"),
        _z(F.sum(F.col("n_g") - F.lit(1))).alias("muc_r_den"),
    )
    psums = by_p.agg(
        _z(F.sum(F.col("n_p") - F.col("parts_p"))).alias("muc_p_num"),
        _z(F.sum(F.col("n_p") - F.lit(1))).alias("muc_p_den"),
    )
    _MU = F.lit(_MICRO).cast("long")
    one = rsums.crossJoin(F.broadcast(psums)).select(
        "n_items",
        "muc_r_num",
        "muc_r_den",
        "muc_p_num",
        "muc_p_den",
        F.when(
            F.col("muc_p_den") > 0,
            F.expr(f"muc_p_num * {_MICRO} div muc_p_den"),
        )
        .otherwise(_MU)
        .cast("long")
        .alias("muc_p_micro"),
        F.when(
            F.col("muc_r_den") > 0,
            F.expr(f"muc_r_num * {_MICRO} div muc_r_den"),
        )
        .otherwise(_MU)
        .cast("long")
        .alias("muc_r_micro"),
    )
    return one.select(
        "*",
        F.when(
            F.col("muc_p_micro") + F.col("muc_r_micro") > 0,
            F.expr(
                "2 * muc_p_micro * muc_r_micro"
                " div (muc_p_micro + muc_r_micro)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("muc_f_micro"),
    )


def blanc(
    assignments: DataFrame,
    *,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """BLANC (Recasens & Hovy 2011) — the bilateral Rand-index adaptation
    for coreference/ER clusters, the sixth gauge of the family (pairwise
    F1 / B³ / ARI / V / MUC / BLANC): where MUC sees only merge links and
    B³ averages over items, BLANC scores the link view BOTH ways — an F1
    over coreference links (same cluster) and an F1 over NON-links
    (different clusters), averaged — so over-merging and over-splitting
    are penalized symmetrically even when singletons dominate (MUC's
    blind spot) or one giant cluster dominates (where raw Rand saturates).

    All four pair classes come from the same contingency moments ARI
    uses (no pair is materialized; linear in items):

        rc = Σ_cells C(n_ij,2)          right coreference links
        wc = sum_a − rc                 pred links the gold splits
        wn = sum_b − rc                 gold links the pred splits
        rn = C(n,2) − sum_a − sum_b + rc   right non-links (incl./excl.)

    P_c = rc/sum_a, R_c = rc/sum_b; P_n = rn/(C(n,2)−sum_a),
    R_n = rn/(C(n,2)−sum_b); BLANC = (F_c + F_n)/2, with the paper's
    boundary conventions: when BOTH sides have no coreference links
    (all-singleton pred AND gold) BLANC = F_n alone; when both have no
    non-links (one cluster covers everything on both sides) BLANC = F_c
    alone; a one-sided zero denominator scores that component 0 (Luo et
    al. 2014 reference-implementation convention).

    Exactness: micro values are floor(num · 10⁶ / den) single bigint
    divisions, F1s harmonic in integers, BLANC one more integer mean —
    bit-identical cross-engine, no floats anywhere. Bigint bound: the
    non-link counts scale with C(n,2), so rn · 10⁶ < 2⁶³ requires
    n ≤ ~4·10⁶ items; beyond that run over a deterministic hash-sample
    (the B³/ARI precedent — every term is a ratio of pair-count moments,
    sample-stable)."""
    lab = assignments.select(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    )

    def _c2(cnt):
        return F.coalesce(
            F.sum(F.expr(f"({cnt} * ({cnt} - 1)) div 2")), F.lit(0)
        ).cast("long")

    cells = (
        lab.groupBy("_p", "_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            _c2("_n").alias("rc"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n"),
        )
    )
    rows_ = (
        lab.groupBy("_p")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(_c2("_n").alias("links_pred"))
    )
    cols_ = (
        lab.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(_c2("_n").alias("links_gold"))
    )
    one = (
        cells.crossJoin(F.broadcast(rows_))
        .crossJoin(F.broadcast(cols_))
        .select(
            "n",
            "rc",
            "links_pred",
            "links_gold",
            F.expr("(n * (n - 1)) div 2").cast("long").alias("c2"),
        )
        .select(
            "*",
            (F.col("c2") - F.col("links_pred") - F.col("links_gold") + F.col("rc"))
            .cast("long")
            .alias("rn"),
        )
    )

    def _micro(num, den):
        return (
            F.when(
                F.expr(den) > 0, F.expr(f"{num} * {_MICRO} div ({den})")
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    def _f1(p, r):
        return (
            F.when(
                F.col(p) + F.col(r) > 0,
                F.expr(f"2 * {p} * {r} div ({p} + {r})"),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    one = one.select(
        "*",
        _micro("rc", "links_pred").alias("blanc_pc_micro"),
        _micro("rc", "links_gold").alias("blanc_rc_micro"),
    ).select(
        "*",
        _micro("rn", "c2 - links_pred").alias("blanc_pn_micro"),
        _micro("rn", "c2 - links_gold").alias("blanc_rn_micro"),
    )
    # DuckDB cannot divide by an expression alias inside div cleanly the
    # same way, so the non-link denominators above are spelled inline in
    # the oracle too (kept in lockstep by the clustering_blanc row)
    one = one.select(
        "*",
        _f1("blanc_pc_micro", "blanc_rc_micro").alias("blanc_fc_micro"),
        _f1("blanc_pn_micro", "blanc_rn_micro").alias("blanc_fn_micro"),
    )
    return one.select(
        "*",
        F.when(
            F.col("links_pred") + F.col("links_gold") == 0,
            F.col("blanc_fn_micro"),
        )
        .when(
            (F.col("c2") - F.col("links_pred"))
            + (F.col("c2") - F.col("links_gold"))
            == 0,
            F.col("blanc_fc_micro"),
        )
        .otherwise(
            F.expr("(blanc_fc_micro + blanc_fn_micro) div 2")
        )
        .cast("long")
        .alias("blanc_micro"),
    )


def correlation_objective(
    assignments: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    cluster_col: str = "cluster",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Correlation-clustering disagreement objective (Bansal, Blum &
    Chawla 2004) — the optimization-view complement of the label-view
    metrics above: given the match-edge graph, a clustering pays 1 for
    every CUT positive edge (endpoints split across clusters) and 1 for
    every MISSING negative pair (co-clustered pair with no edge). This is
    the objective pivot/KwikCluster 3-approximates and the number that
    makes the cover family comparable on equal terms: transitive CC has
    cut = 0 BY CONSTRUCTION (connected endpoints always co-cluster), so
    its whole cost is the over-merge term, while star/center/pivot trade
    cut > 0 for fewer missing pairs — the chain-merge dilemma as one
    exact integer.

    ``assignments``: (id, cluster) — total over the items of interest;
    edge endpoints absent from it are dropped from the gauge (documented,
    not silent: n_edges counts surviving edges). Self-loops and duplicate
    orientations are canonicalized away.

    Returns ONE row: (n_items, n_clusters, n_edges, intra_edges,
    intra_pairs, cut_edges, missing_edges, disagreements). Scale shape:
    intra_pairs is Σ C(n_c, 2) from cluster SIZES (map-combinable, no
    pair materialized); intra_edges is one narrow two-key join of the
    edge list against the assignment table; everything else is integer
    arithmetic on a one-row frame."""
    asg = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_cl")
    )
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_b"),
        )
        .where(F.col("_a") != F.col("_b"))
        .distinct()
    )
    ej = (
        e.join(
            asg.select(
                F.col("_id").alias("_a"), F.col("_cl").alias("_cla")
            ),
            "_a",
        )
        .join(
            asg.select(
                F.col("_id").alias("_b"), F.col("_cl").alias("_clb")
            ),
            "_b",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.coalesce(
                F.sum(
                    F.when(F.col("_cla") == F.col("_clb"), 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("intra_edges"),
        )
    )
    pm = (
        asg.groupBy("_cl")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.coalesce(F.sum(F.expr("(_n * (_n - 1)) div 2")), F.lit(0))
            .cast("long")
            .alias("intra_pairs"),
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_items"),
        )
    )
    return (
        ej.crossJoin(F.broadcast(pm))
        .withColumn("cut_edges", F.col("n_edges") - F.col("intra_edges"))
        .withColumn(
            "missing_edges", F.col("intra_pairs") - F.col("intra_edges")
        )
        .withColumn(
            "disagreements", F.col("cut_edges") + F.col("missing_edges")
        )
        .select(
            "n_items",
            "n_clusters",
            "n_edges",
            "intra_edges",
            "intra_pairs",
            "cut_edges",
            "missing_edges",
            "disagreements",
        )
    )
