"""spark-submit entrypoint: evaluate the linker on an AIDA-CoNLL dataset.

Usage:

    zip -r xlink_spark.zip xlink_spark
    spark-submit --py-files xlink_spark.zip jobs/run_eval_conll.py \\
        --conll /lake/aida/testb.conll --snapshots /lake/snapshots \\
        --word-emb /lake/word_embeddings --entity-emb /lake/entity_embeddings \\
        [--kb-uris /lake/kb_uris]

Loads the frozen dictionary from committed snapshots (run
jobs/run_pipeline.py first), parses the CoNLL file(s) into docs + gold
mentions (reference semantics: AnnotationFormatter.py:27-86), links the
docs with the standard batch DAG, and prints one JSON metrics line:
dataset counters (total/NIL/miss/NME) + mention P/R/F1 + pairwise linking
P/R/F1 with blocked accuracy (the ≥0.99 gate metric).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conll", required=True)
    ap.add_argument("--snapshots", required=True)
    ap.add_argument("--word-emb", required=True)
    ap.add_argument("--entity-emb", required=True)
    ap.add_argument("--kb-uris", help="(uri, entity_id) parquet for gold resolution")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from xlink_spark.eval.conll import eval_on_conll
    from xlink_spark.plans.incremental import load_dictionary
    from xlink_spark.plans.snapshots import SnapshotStore
    from xlink_spark.session import get_spark

    spark = get_spark(app_name="xlink_eval_conll", master=args.master)
    t0 = time.time()
    d = load_dictionary(spark, SnapshotStore(args.snapshots))
    kb_uris = spark.read.parquet(args.kb_uris) if args.kb_uris else None
    report = eval_on_conll(
        spark,
        args.conll,
        d,
        spark.read.parquet(args.word_emb),
        spark.read.parquet(args.entity_emb),
        kb_uris,
    )
    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
