"""Extra measurement harness for optimization work (bench.py is frozen).

Times individual declared queries in isolation with the noop sink
(guide §1.4), labels jobs, and can dump .explain("formatted") plans.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (cold+warm, noop)
  python bench_extra.py --reps 3 q1 ...      # repeat
  python bench_extra.py --explain-dir plans/r06 --suffix before q1 ...
  python bench_extra.py --count q1 ...       # use .count() like bench.py

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    explain_dir = None
    suffix = "before"
    use_count = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain-dir":
            explain_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--count":
            use_count = True; i += 1
        else:
            names.append(a); i += 1

    from xlink_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="xlink_bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        runs = []
        warm_runs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} cold rep{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name} warm rep{r}")
            t0 = time.time()
            df2 = qs[name](spark, SF_DIR)
            if use_count:
                df2.count()
            else:
                df2.write.format("noop").mode("overwrite").save()
            warm_runs.append(round(time.time() - t0, 3))
            if explain_dir and r == 0:
                os.makedirs(explain_dir, exist_ok=True)
                plan = df2._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(f"{explain_dir}/{name}_{suffix}.txt", "w") as f:
                    f.write(plan)
            spark.catalog.clearCache()
        out[name] = {"cold": runs, "warm": warm_runs}
        print(json.dumps({name: out[name]}), flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
