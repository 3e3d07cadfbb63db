"""Profile declared queries with Spark event logs.

Runs queries (noop sink) in one session with event logging on, then
summarizes per-job wall time, task time, GC, shuffle bytes and spill from
the event log. The job descriptions set by the harness mark query
boundaries.

Usage: python tools/profile_query.py [--count] name [name ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, XLINK_DRIVER_MEM etc.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVDIR = "/tmp/spark-events-profile"


def summarize(evdir: str) -> None:
    import glob

    import subprocess

    files = sorted(
        glob.glob(f"{evdir}/*/events_*") + [p for p in glob.glob(f"{evdir}/*") if os.path.isfile(p)],
        key=os.path.getmtime,
    )
    if not files:
        print("no event log found")
        return

    def lines():
        for path in files:
            if path.endswith(".zstd"):
                out = subprocess.run(
                    ["zstd", "-dc", path], capture_output=True
                ).stdout.decode("utf-8", "replace")
                yield from out.splitlines()
            else:
                with open(path) as f:
                    yield from f

    path = files[-1]
    jobs = {}  # job_id -> dict
    stage_to_job = {}
    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "")
                jobs[jid] = {
                    "desc": desc,
                    "t0": ev.get("Submission Time", 0),
                    "t1": None,
                    "task_ms": 0,
                    "gc_ms": 0,
                    "shuffle_read": 0,
                    "shuffle_write": 0,
                    "spill_disk": 0,
                    "n_tasks": 0,
                    "input_bytes": 0,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                jid = stage_to_job.get(sid)
                if jid is None or jid not in jobs:
                    continue
                m = ev.get("Task Metrics") or {}
                j = jobs[jid]
                j["n_tasks"] += 1
                j["task_ms"] += m.get("Executor Run Time", 0)
                j["gc_ms"] += m.get("JVM GC Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                j["shuffle_read"] += srm.get("Local Bytes Read", 0) + srm.get(
                    "Remote Bytes Read", 0
                )
                swm = m.get("Shuffle Write Metrics") or {}
                j["shuffle_write"] += swm.get("Shuffle Bytes Written", 0)
                j["spill_disk"] += m.get("Disk Bytes Spilled", 0)
                im = m.get("Input Metrics") or {}
                j["input_bytes"] += im.get("Bytes Read", 0)

    # aggregate by description
    by_desc = {}
    for jid, j in sorted(jobs.items()):
        d = j["desc"] or "(none)"
        a = by_desc.setdefault(
            d,
            {
                "jobs": 0,
                "wall_ms": 0,
                "task_ms": 0,
                "gc_ms": 0,
                "shuffle_read": 0,
                "shuffle_write": 0,
                "spill_disk": 0,
                "n_tasks": 0,
                "input_mb": 0,
            },
        )
        a["jobs"] += 1
        if j["t1"]:
            a["wall_ms"] += j["t1"] - j["t0"]
        a["task_ms"] += j["task_ms"]
        a["gc_ms"] += j["gc_ms"]
        a["shuffle_read"] += j["shuffle_read"]
        a["shuffle_write"] += j["shuffle_write"]
        a["spill_disk"] += j["spill_disk"]
        a["n_tasks"] += j["n_tasks"]
        a["input_mb"] += j["input_bytes"] // (1 << 20)
    print(f"\n=== per-description job summary ({os.path.basename(path)}) ===")
    print(
        f"{'desc':<42} {'jobs':>5} {'wall_s':>8} {'task_s':>8} {'gc_s':>6} "
        f"{'tasks':>6} {'shR_MB':>7} {'shW_MB':>7} {'spill_MB':>8}"
    )
    for d, a in by_desc.items():
        print(
            f"{d[:42]:<42} {a['jobs']:>5} {a['wall_ms']/1000:>8.2f} "
            f"{a['task_ms']/1000:>8.1f} {a['gc_ms']/1000:>6.1f} "
            f"{a['n_tasks']:>6} {a['shuffle_read']//(1<<20):>7} "
            f"{a['shuffle_write']//(1<<20):>7} {a['spill_disk']//(1<<20):>8}"
        )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    use_count = "--count" in args
    names = [a for a in args if not a.startswith("--")]

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from xlink_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="xlink_profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
        },
    )
    qs = entrymod.queries()
    times = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{name}|cold")
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        if use_count:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        cold = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(f"{name}|warm")
        t0 = time.time()
        df2 = qs[name](spark, SF_DIR)
        if use_count:
            df2.count()
        else:
            df2.write.format("noop").mode("overwrite").save()
        warm = round(time.time() - t0, 3)
        times[name] = {"cold": cold, "warm": warm}
        print(json.dumps({name: times[name]}), flush=True)
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    time.sleep(1)
    summarize(EVDIR)


if __name__ == "__main__":
    main()
