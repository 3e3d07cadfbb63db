"""The spark-submit job entrypoints, driven in-session via their importable
bodies (the CLI wrapper only parses args and prints the same metrics)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_JOBS_DIR = str(Path(__file__).resolve().parent.parent / "jobs")


def _curation_args(**kw) -> argparse.Namespace:
    base = dict(
        documents=None, output=None, format="parquet", eval_docs=None,
        min_quality=0.2, max_dup_line_frac=None, max_top_bigram_frac=None,
        neardup_threshold=0.8, contamination_ngram=13, redact=False,
        snapshots=None, master=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_run_curation_job_jsonl_with_snapshots(spark, tmp_path):
    """The curation job end-to-end: JSONL input with a malformed line
    (quarantined), exact dup dropped, junk dropped, kept docs committed
    through the SnapshotStore with audit counts in the manifest, per-doc
    fates written, metrics consistent."""
    sys.path.insert(0, _JOBS_DIR)
    from run_curation import run_curation_job

    from xlink_spark.plans.snapshots import SnapshotStore

    body = "the quick brown fox jumps over the lazy dog and is happy in the sun today"
    src = tmp_path / "corpus.jsonl"
    src.write_text(
        f'{{"doc_id": "a", "text": "{body}"}}\n'
        f'{{"doc_id": "b", "text": "{body}"}}\n'      # exact dup of a
        '{"doc_id": "c", "text": "!!! ??? ,,,"}\n'     # junk
        'not json at all\n'                            # quarantined
        '{"doc_id": "d", "text": "a completely different ordinary sentence with the usual common words"}\n'
    )
    args = _curation_args(
        documents=str(src), output=str(tmp_path / "out"), format="jsonl",
        snapshots=str(tmp_path / "snap"),
    )
    m = run_curation_job(spark, args)
    assert m["n_quarantined"] == 1
    assert m["n_in"] == 5 and m["n_kept"] == 2 and m["n_dropped"] == 2
    assert m["drops_by_stage"] == {"exact_dup": 1, "low_quality": 1, "near_dup": 0}

    store = SnapshotStore(str(tmp_path / "snap"))
    kept = {r["doc_id"] for r in store.read_table(spark, "curated_docs").collect()}
    assert kept == {"a", "d"}
    # audit counts landed in the committed manifest (resume metadata)
    man = store.manifest("curated_docs")
    assert man["metrics"]["exact_dup"] == 1 and man["rows"] == 2
    fates = {
        r["doc_id"]: r["stage"]
        for r in store.read_table(spark, "curation_drops").collect()
    }
    assert fates == {"b": "exact_dup", "c": "low_quality"}


def test_run_curation_job_parquet_redact(spark, tmp_path):
    """Parquet input + --redact: survivors' text is scrubbed in place."""
    sys.path.insert(0, _JOBS_DIR)
    from run_curation import run_curation_job

    docs = spark.createDataFrame(
        [("p1", "write to bob@example.org for the usual and common details today")],
        "doc_id string, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    args = _curation_args(
        documents=src, output=str(tmp_path / "out"), min_quality=0.0, redact=True
    )
    m = run_curation_job(spark, args)
    assert m["n_kept"] == 1
    kept = spark.read.parquet(str(tmp_path / "out" / "kept")).collect()[0]
    assert "<EMAIL>" in kept["text"] and kept["n_emails"] == 1


def test_parquet_dir_rows_matches_written_data(spark, tmp_path):
    """parquet_dir_rows counts a written directory from file footers
    driver-side — the count a writer uses instead of re-scanning its own
    output — and it launches ZERO Spark jobs."""
    from xlink_spark.plans.snapshots import parquet_dir_rows

    p = str(tmp_path / "t.parquet")
    spark.range(1234).repartition(7).write.parquet(p)
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None))
    assert parquet_dir_rows(p) == 1234
    assert len(sc.statusTracker().getJobIdsForGroup(None)) == before
