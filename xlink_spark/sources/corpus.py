"""Corpus ingestion & standardization (SURVEY §2.1 S1/S2, §2.2 F9).

Reference: corpus_full_refine (prepare_standard_input.py:333-516) reads
``title\\t\\tsub_title\\t\\turl\\t\\tcontent`` lines, validates annotation
brackets, resolves each doc to its entity via the URI index with a
full-title fallback (J2), rewrites ``[[mention|url]]`` anchors to
``[[entity_id|mention]]``, and counts rejects (error_no).

Spark redesign: spark.read.text → split on the double-tab separator →
quarantine_split on validity predicates → broadcast joins against kb_uris /
kb_entities → JVM-side anchor-URL rewrite → parse_markup_to_spans. One scan,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xlink_spark.functions.text import normalize_uri
from xlink_spark.operators.spans import is_markup_valid, parse_markup_to_spans
from xlink_spark.plans.lineage import quarantine_split

SEP = "\t\t"


def read_raw_corpus(spark, path: str) -> DataFrame:
    """4-column raw corpus lines → (title, sub_title, url, content).

    Column-count validation mirrors ``len(line_arr) != 4: continue``
    (utils/dictionary.py:82); short rows go to the quarantine side.
    """
    lines = spark.read.text(path)
    parts = lines.select(F.split(F.col("value"), SEP).alias("p"))
    # try_element_at: short rows yield nulls (ANSI mode would throw)
    return parts.select(
        F.try_element_at("p", F.lit(1)).alias("title"),
        F.try_element_at("p", F.lit(2)).alias("sub_title"),
        F.try_element_at("p", F.lit(3)).alias("url"),
        F.try_element_at("p", F.lit(4)).alias("content"),
        (F.size("p") == 4).alias("_shape_ok"),
    )


def resolve_doc_entity(
    docs: DataFrame, kb_uris: DataFrame, kb_entities: DataFrame
) -> DataFrame:
    """J2: doc → entity_id via URI index, parent-path + full-title fallbacks.

    Reference: prepare_standard_input.py:396-400 +
    get_entity_by_uri_and_title (dictionary.py:124-139). On a URI-index
    miss, get_entity_by_uri (dictionary.py:124-132) retries with the LAST
    PATH SEGMENT DROPPED (``'/'.join(uri.split('/')[:-1])``) — Baidu URLs
    often carry a trailing disambiguator segment; only then falls back to
    the full title. All lookup tables are KB-bounded → broadcast joins; the
    precedence is one coalesce.
    """
    uri_index = F.broadcast(
        kb_uris.select(F.col("uri").alias("_uri"), F.col("entity_id").alias("_eid"))
    )
    by_uri = docs.withColumn("_uri", normalize_uri("url")).join(
        uri_index.withColumnRenamed("_eid", "_eid_uri"), "_uri", "left"
    )
    # parent path: drop the trailing '/segment'; no '/' at all ⇒ '' (the
    # reference's ''.join(...[:-1]) result), which simply never matches
    parent = F.when(
        F.col("_uri").contains("/"), F.regexp_replace("_uri", r"/[^/]*$", "")
    ).otherwise(F.lit(""))
    by_parent = by_uri.withColumn("_puri", parent).join(
        uri_index.select(
            F.col("_uri").alias("_puri"), F.col("_eid").alias("_eid_parent")
        ),
        "_puri",
        "left",
    )
    full_title = F.concat(F.col("title"), F.coalesce(F.col("sub_title"), F.lit("")))
    by_title = by_parent.withColumn("_ft", full_title).join(
        F.broadcast(
            kb_entities.select(
                F.col("full_title").alias("_ft"), F.col("entity_id").alias("_eid_title")
            )
        ),
        "_ft",
        "left",
    )
    return by_title.withColumn(
        "entity_id", F.coalesce("_eid_uri", "_eid_parent", "_eid_title")
    ).drop("_uri", "_puri", "_ft", "_eid_uri", "_eid_parent", "_eid_title")


_QUARANTINE_REASONS = ("bad_shape", "unresolved_entity", "invalid_markup")


def standardize_corpus(
    spark,
    path: str,
    kb_uris: DataFrame,
    kb_entities: DataFrame,
    store=None,
    stage: str = "standard_corpus",
) -> tuple[DataFrame, DataFrame]:
    """S1 end-to-end: raw lines → (documents(spans), quarantined).

    documents: (doc_id=entity_id, spans) — the reference emits
    ``eid\\t\\ttext`` (the annotated "standard corpus"); we emit the span
    form directly. Rows failing shape/validity/resolution are returned as
    the quarantine DataFrame with a reason column (error_no semantics,
    prepare_standard_input.py:349-398 — but keeping the rows, not just the
    count).

    ``store``: when a SnapshotStore is given, both sides are committed —
    ``<stage>_quarantine`` first (its write evaluates an observe() on the
    reject stream), then ``<stage>`` with the per-reason reject counters and
    the observed accepted-row count recorded in its manifest metrics: the
    reference's error_no tallies, durably attached to the snapshot they
    describe.
    """
    raw = read_raw_corpus(spark, path)
    resolved = resolve_doc_entity(raw, kb_uris, kb_entities)
    ok_pred = (
        F.col("_shape_ok")
        & F.col("entity_id").isNotNull()
        & is_markup_valid(F.coalesce("content", F.lit("")))
    )
    valid, invalid, obs = quarantine_split(resolved, ok_pred, "corpus_standardize")
    invalid = invalid.withColumn(
        "reason",
        F.when(~F.col("_shape_ok"), F.lit("bad_shape"))
        .when(F.col("entity_id").isNull(), F.lit("unresolved_entity"))
        .otherwise(F.lit("invalid_markup")),
    )
    docs = valid.select(F.col("entity_id").alias("doc_id"), F.col("content").alias("text"))
    spans = parse_markup_to_spans(docs)
    if store is None:
        return spans, invalid

    from pyspark.sql import Observation

    inv_obs = Observation()
    invalid_observed = invalid.observe(
        inv_obs,
        F.count(F.lit(1)).alias("rejected"),
        *[
            F.sum((F.col("reason") == r).cast("long")).alias(r)
            for r in _QUARANTINE_REASONS
        ],
    )
    store.commit_table(
        f"{stage}_quarantine",
        invalid_observed,
        metrics_fn=lambda: {"quarantine": {k: int(v or 0) for k, v in inv_obs.get.items()}},
    )
    store.commit_table(
        stage,
        spans,
        metrics_fn=lambda: {
            "quarantine": {k: int(v or 0) for k, v in inv_obs.get.items()},
            "accepted_rows": int(obs.get["rows"]),
        },
    )
    return store.read_table(spark, stage), store.read_table(spark, f"{stage}_quarantine")


def mark_title_mentions(resolved: DataFrame) -> DataFrame:
    """C14/S1 mark_titles option: self-mention injection.

    Reference: prepare_standard_input.py:357-361, 407, 442 — every literal
    occurrence of the doc's own title in its content becomes an anchor to
    the doc's entity. Literal (non-regex) replace keeps titles with regex
    metacharacters safe, mirroring the reference's re.escape.
    """
    marked = F.expr(
        "replace(content, title, concat('[[', entity_id, '|', title, ']]'))"
    )
    return resolved.withColumn(
        "content",
        F.when(
            F.col("entity_id").isNotNull()
            & F.col("title").isNotNull()
            & (F.length("title") > 0)
            # don't nest: skip docs whose content already anchors the title
            & ~F.coalesce("content", F.lit("")).contains(
                F.concat(F.lit("|"), F.col("title"), F.lit("]]"))
            ),
            marked,
        ).otherwise(F.col("content")),
    )


def infobox_pre_refine(infobox_json: DataFrame, content_col: str = "content") -> DataFrame:
    """S2: flatten a JSON infobox {k: v} into 'k v k v …' text.

    Reference: infobox_pre_refine (prepare_standard_input.py:99-136).
    from_json with a map schema + map flattening — no UDF.
    """
    parsed = infobox_json.withColumn(
        "_m", F.from_json(F.col(content_col), "map<string,string>")
    )
    flat = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                F.map_entries("_m"), lambda e: F.array(e["key"], e["value"])
            )
        ),
    )
    return parsed.withColumn("flat_text", flat).drop("_m")


def read_ttl_entities(spark, path: str) -> DataFrame:
    """S3: .ttl dump → (entity_id, label, supplement).

    Reference: get_id2title_from_ttl (prepare_standard_input.py:13-40) scans
    for rdfs:label and property:supplement triples. Regex extracts + one
    groupBy.
    """
    lines = spark.read.text(path)
    sid = F.regexp_extract("value", r"<[^>]*/([^/>]+)>\s", 1)
    label = F.regexp_extract("value", r'rdfs:label\s+"([^"]*)"', 1)
    supp = F.regexp_extract("value", r'property:supplement\s+"([^"]*)"', 1)
    rows = lines.select(
        sid.alias("entity_id"), label.alias("label"), supp.alias("supplement")
    ).filter((F.col("label") != "") | (F.col("supplement") != ""))
    return rows.groupBy("entity_id").agg(
        F.max(F.when(F.col("label") != "", F.col("label"))).alias("label"),
        F.max(F.when(F.col("supplement") != "", F.col("supplement"))).alias("supplement"),
    )


def read_gold_dataset(spark, docs_json: str, annotations_json: str) -> DataFrame:
    """S9: DatasetLoader format → gold_mentions DataFrame.

    Reference: evaluation/DatasetLoader.py:8-27 — docs.json is List[str],
    annotations.json is List[List[(start, end, label, entity_id|"NIL")]].
    """
    import json

    with open(docs_json) as f:
        docs = json.load(f)
    with open(annotations_json) as f:
        anns = json.load(f)
    rows = []
    for i, (doc, ann) in enumerate(zip(docs, anns)):
        for start, end, label, eid in ann:
            rows.append((f"d{i:06d}", int(start), int(end), label, eid or "NIL"))
    return spark.createDataFrame(
        rows, "doc_id string, start int, end int, surface string, entity_id string"
    )


def in_links(out_links: DataFrame, entity_id: str, kb_entities: DataFrame) -> DataFrame:
    """S12: docs whose out-links contain X, joined to the entity dict.

    Reference: get_in_links.py:5-19 (CLI --id).
    """
    hits = out_links.filter(F.col("entity_id") == entity_id).select("doc_id")
    return hits.join(
        kb_entities.select(F.col("entity_id").alias("doc_id"), "title", "full_title"),
        "doc_id",
        "left",
    )
