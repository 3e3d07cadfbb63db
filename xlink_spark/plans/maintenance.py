"""Lake maintenance: small-file compaction + snapshot expiration.

The Iceberg-maintenance analogues for the snapshot stores (Iceberg:
``rewrite_data_files`` / ``expire_snapshots``). At 10^12 documents the two
rots these fight are real and compounding: every incremental batch commits
another iteration (the links stage grows one directory per batch forever),
and every commit of a small delta writes small parquet files whose
per-file open cost eventually dominates scans.

All operations go through the stores' public commit protocol, so every
rewrite inherits the durable-overwrite guarantees (rename-aside swap /
staged catalog table, manifest-last): a crash at any instant leaves a
complete, manifest-valid copy of the data readable. On a real Iceberg
catalog these jobs are superseded by the engine-side procedures — this
module is the parquet-backend equivalent with the same contracts.

Semantics guard: ``expire_iterations`` is ONLY for last-iteration-wins
stages (the CC loop's per-iteration resume points, cluster.py:66 — older
iterations are superseded state). Union-semantics delta stages (the
incremental ``links`` stage, plans/incremental.all_links) must use
``SnapshotStore.squash_iterations`` instead, which rewrites the union
atomically; expiring one of their iterations would silently drop that
batch's links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def plan_file_count(rows: int, target_rows_per_file: int) -> int:
    """ceil(rows / target), min 1 — the rewrite's output file count."""
    t = max(1, int(target_rows_per_file))
    return max(1, (int(rows) + t - 1) // t)


def compact_table(
    store,
    spark: SparkSession,
    name: str,
    target_rows_per_file: int = 8_000_000,
) -> dict | None:
    """Rewrite a committed named table into ceil(rows/target) files.

    Reads the committed data, repartitions to the planned file count, and
    re-commits under the same name — the store's overwrite protocol keeps a
    complete copy on disk at every instant, and the new manifest records
    the compaction provenance. Returns the new manifest, or None when the
    table already meets the target (never rewrites bytes for nothing).
    Works against either backend (directory or catalog) because it uses
    only the shared store surface.
    """
    man = store.manifest(name)
    rows = int(man["rows"])
    n_files = plan_file_count(rows, target_rows_per_file)
    current = int(man.get("partitions", 0)) or None
    if current is not None and current <= n_files:
        return None
    df = store.read_table(spark, name).repartition(n_files)
    return store.commit_table(
        name,
        df,
        metrics={
            **man.get("metrics", {}),
            "compacted_from_files": current,
            "target_rows_per_file": int(target_rows_per_file),
        },
    )


def compact_iteration(
    store,
    spark: SparkSession,
    stage: str,
    iteration: int,
    target_rows_per_file: int = 8_000_000,
) -> dict | None:
    """``compact_table`` for one committed iteration snapshot."""
    man = store.manifest(stage, iteration)
    rows = int(man["rows"])
    n_files = plan_file_count(rows, target_rows_per_file)
    current = int(man.get("partitions", 0)) or None
    if current is not None and current <= n_files:
        return None
    df = store.read_iteration(spark, stage, iteration).repartition(n_files)
    return store.commit(
        stage,
        iteration,
        df,
        metrics={
            **man.get("metrics", {}),
            "compacted_from_files": current,
            "target_rows_per_file": int(target_rows_per_file),
        },
    )


def expire_iterations(store, stage: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` iterations of a LAST-WINS stage.

    The CC loop's snapshot trail (cluster.py:66) is pure resume state —
    only the newest iteration feeds a restart, so the older ones are
    reclaimable the moment a newer commit lands. Returns the dropped ids,
    newest-kept unchanged. Refuses to drop everything (keep_last ≥ 1): an
    empty trail would turn the next resume into a full recompute.

    Do NOT point this at union-semantics delta stages — see the module
    docstring; use ``SnapshotStore.squash_iterations`` there.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    iters = store.iterations(stage)
    drop = iters[:-keep_last]
    for k in drop:
        store.drop_iteration(stage, k)
    return drop
