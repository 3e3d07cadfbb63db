"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Modes:
  python bench.py                 # standard bench (local[$SPARK_GRAFT_CPUS])
  python bench.py --scaling       # same flagship job at local[8] and
                                  # local[32]; prints throughputs +
                                  # scaling efficiency (N vs 4N evidence)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline set: the flagship UDF pipeline + one representative per operator
# family (agg, window, join/topk, dedup, ANN, clustering)
HEADLINE = [
    "linking_pipeline",
    "q1_pricing_summary",
    "conflict_groups_w1",
    "topk_parts_per_supplier",
    "lsh_jaccard_pairs",
    "ann_topk",
    "connected_components",
    "quality_scores",
]


def _materialize(df) -> int:
    return df.count()


def run_suite(master: str, shuffle_partitions: int) -> tuple[dict[str, float], int]:
    from xlink_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="xlink_bench", master=master, shuffle_partitions=shuffle_partitions
    )
    qs = entrymod.queries()
    times: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for name in HEADLINE:
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
    spark.stop()
    return times, n_docs


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            t0 = time.time()
            times, n_docs = run_suite(f"local[{cores}]", cores)
            total = round(sum(times.values()), 3)
            results[cores] = {
                "total_sec": total,
                "docs_per_sec": round(n_docs / times["linking_pipeline"], 1),
                "queries": times,
            }
        eff = (
            results[8]["total_sec"] / results[32]["total_sec"] / 4.0
            if results[32]["total_sec"]
            else 0.0
        )
        tput_eff = (
            results[32]["docs_per_sec"] / results[8]["docs_per_sec"] / 4.0
        )
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_local8_vs_local32",
                    "value": round(tput_eff, 3),
                    "unit": "ratio",
                    "sf": sf,
                    "local8": results[8],
                    "local32": results[32],
                    "wall_time_ratio": round(
                        results[8]["total_sec"] / results[32]["total_sec"], 3
                    ),
                }
            )
        )
        return

    times, n_docs = run_suite(f"local[{CPUS}]", CPUS)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "docs_per_sec": round(n_docs / times["linking_pipeline"], 1),
                "n_docs": n_docs,
            }
        )
    )


if __name__ == "__main__":
    main()
