"""Incremental linking: process only new documents against committed state.

The lake grows continuously; rebuilding the dictionary and re-linking
10^12 documents for each drop is not a plan. This module adds the
incremental path on top of the snapshot store:

* ``load_dictionary`` — rehydrate the Dictionary from committed snapshots
  (no recomputation; fails loudly on a missing stage).
* ``link_increment``  — link one batch of new docs with the frozen
  dictionary and commit the links as ``links/iter_k`` snapshots; each batch
  is atomic and a re-run of the same batch id is idempotent (skip-if-
  committed).

Dictionary refresh stays a periodic batch job (build_dictionary over the
full corpus or streaming.running_anchor_totals feeding deltas) — the
standard lambda split: cheap incremental links now, exact stats refresh on
a cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xlink_spark.config import DEFAULT, EngineConfig
from xlink_spark.plans.pipeline import Dictionary, link_corpus
from xlink_spark.plans.snapshots import SnapshotStore

_STAGES = (
    "mention_anchors",
    "title_entities",
    "e_given_m",
    "entity_prior",
    "m_given_e",
    "link_prob",
)


def load_dictionary(spark: SparkSession, store: SnapshotStore) -> Dictionary:
    """Rehydrate the predictor's input tables from committed snapshots."""
    missing = [s for s in _STAGES if not store.has_table(s)]
    if missing:
        raise FileNotFoundError(
            f"dictionary snapshots missing: {missing} — run build_dictionary first"
        )
    t = {s: store.read_table(spark, s) for s in _STAGES}
    return Dictionary(
        mention_anchors=t["mention_anchors"],
        title_entities=t["title_entities"],
        e_given_m=t["e_given_m"],
        entity_prior=t["entity_prior"],
        m_given_e=t["m_given_e"],
        link_prob=t["link_prob"],
    )


def link_increment(
    store: SnapshotStore,
    batch_id: int,
    new_docs_plain: DataFrame,
    word_emb: DataFrame,
    entity_emb: DataFrame,
    cfg: EngineConfig = DEFAULT,
    dictionary=None,
) -> DataFrame:
    """Link one new-document batch against the frozen dictionary.

    Idempotent per batch_id: an already-committed batch is returned from its
    snapshot without recomputation (safe to re-run after a crash).
    ``dictionary``: pass a preloaded Dictionary to skip the per-call
    snapshot reads (streaming loads it once for the whole query). Any
    DataFrames the linking plan persists are unpersisted after the commit —
    repeated batches must not accumulate cached blocks.
    """
    spark = new_docs_plain.sparkSession
    if batch_id in store.iterations("links"):
        return store.read_iteration(spark, "links", batch_id)
    d = dictionary if dictionary is not None else load_dictionary(spark, store)
    held: list = []
    try:
        links = link_corpus(
            new_docs_plain, d, word_emb, entity_emb, cfg, persisted_out=held
        )
        store.commit(
            "links", batch_id, links, metrics={"batch_id": batch_id}
        )
    finally:
        # a failed commit must not leak cached blocks into the retry
        for p_ in held:
            p_.unpersist()
    # return THIS batch's committed snapshot, not the latest iteration —
    # re-running an older gap batch after newer ones committed must hand
    # back the gap batch's rows
    return store.read_iteration(spark, "links", batch_id)


def all_links(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """Union of every committed link batch (the lake's links view).

    Enumerates MANIFEST-VALID iterations through the store — never a path
    glob, which would also match stale ``.tmp-`` dirs from a crashed commit
    and manifest-less half-written batches.
    """
    return store.read_iterations_union(spark, "links")
