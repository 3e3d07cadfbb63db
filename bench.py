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
# family (agg, window, join/topk, dedup, ANN, clustering). The ANN entries
# are the SCALE paths (SRP buckets, IVF equi-join); ann_topk stays listed as
# the labeled brute-force baseline for comparison, never as the headline.
HEADLINE = [
    "linking_pipeline",
    "q1_pricing_summary",
    "conflict_groups_w1",
    "topk_parts_per_supplier",
    "lsh_jaccard_pairs",
    "ann_topk_srp",
    "ann_topk_ivf",
    "ann_topk_ivf_c256",  # join-quantizer assignment path (C=256)
    "ann_topk",
    "connected_components",
    "quality_scores",
    "detected_mentions",  # join-path detection (n-gram ⋈ dictionary table)
    "curation_plan",      # the composed end-to-end curation chain
    "linking_pipeline_ascii",  # the fully-oracled flagship variant
    "lm_scores",          # bigram-LM fluency filter (broadcast model joins)
    "jaccard_pairs_exact",  # exact PPJoin set-similarity (zero-miss near-dup)
    "coherence_rerank",   # collective linking: detect → priors → WLM rerank
    "fs_pair_scores",     # SNM blocking → Fellegi-Sunter pairwise scores
    "fs_level_scores",    # multi-level gamma FS (levenshtein band levels)
    "qgram_blocks",       # q-gram blocking with stop-gram purge
    "cluster_repair",     # escalation repair of chain-merged ER clusters
    "allpairs_name_blocks",  # prefix-filtered exact set-similarity blocking
    "group_linkage_ges",  # household GES over mutual-best member alignment
    "clustering_conll",   # CoNLL-2012 score (MUC+B3+CEAF_e) over the ER chain
    "star_clusters",      # chain-merge-immune star cover (Aslam 2004)
    "soft_tfidf_scores",  # Soft-TFIDF hybrid comparator (Cohen 2003)
    "pprl_dice_scores",   # Bloom-filter PPRL Dice comparator (Schnell 2009)
    "pprl_hlsh_pairs",    # full PPRL: CLK encode → Hamming-LSH → Dice verify
    "pivot_clusters",     # KwikCluster LFMIS rounds + min-pivot assignment
    "one_to_one_matches",  # clean-clean iterated mutual-best assignment
    "truth_trust_avglog",  # Sums vs Average-Log source-trust fixed points
    "vector_blocks",       # LSH vector blocking + exact-cosine verify
    "iterative_merge_er",  # Swoosh union-merge rounds (2 merge rounds + CC)
    "block_split_pairs",   # BlockSplit-balanced within-block quadratic
    "edit_distance_pairs",  # exact ed<=1 self-join (Ed-Join prefix filter)
    "edit_distance_pairs_delete",  # same join via FastSS deletion variants
    "learned_blocking",    # greedy adaptive blocking-scheme selection
    "active_learning_batch",  # ALIAS uncertainty-sampled labeling batch
    "clustering_objective",   # correlation-clustering disagreement gauge
    "meta_blocking_wnp",      # node-centric meta-blocking pruning
]


def _materialize(df) -> int:
    return df.count()


def run_suite(master: str, shuffle_partitions: int) -> tuple[dict, dict, int]:
    from xlink_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="xlink_bench", master=master, shuffle_partitions=shuffle_partitions
    )
    qs = entrymod.queries()
    times: dict[str, float] = {}
    times_warm: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for name in HEADLINE:
        # cold (authoritative): nothing of this query is cached yet and the
        # previous query's persisted tables were dropped
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
        # warm: immediate re-run with whatever the query itself persists
        # still resident — separates plan cost from measurement-mode cost
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        times_warm[name] = round(time.time() - t0, 3)
        # each query measured cold: drop this query's persisted tables so
        # cross-query cache memory pressure doesn't skew the next timing
        spark.catalog.clearCache()
    spark.stop()
    return times, times_warm, n_docs


def _build_scaled_corpus(multiplier: int = 8) -> str:
    """Replicate the documents table ×multiplier (distinct doc_ids) into a
    temp sf dir so the flagship job is compute-dominated rather than
    overhead-dominated — the honest N-vs-4N measurement regime. Both
    parallelism levels read the SAME materialized input."""
    import shutil

    out = f"/tmp/xlink_scaled_{multiplier}x"
    if not os.path.exists(f"{out}/_READY"):
        from pyspark.sql import functions as F

        from xlink_spark.session import get_spark

        spark = get_spark(app_name="scale_corpus", master="local[8]", shuffle_partitions=8)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        scaled = docs
        for k in range(1, multiplier):
            scaled = scaled.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + k * 1_000_000)
            )
        os.makedirs(out, exist_ok=True)
        scaled.repartition(64).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        spark.stop()
        shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{out}/embeddings.parquet")
        open(f"{out}/_READY", "w").close()
    return out


def run_flagship(master: str, shuffle_partitions: int, sf_dir: str) -> tuple[float, int]:
    from xlink_spark.flagship import linking_pipeline
    from xlink_spark.session import get_spark

    spark = get_spark(
        app_name="xlink_scaling",
        master=master,
        # 2x cores: finer tasks smooth doc-length stragglers in the fat stage
        shuffle_partitions=shuffle_partitions * 2,
        extra_conf={
            # the test corpus is CPU-heavy per byte (Python scan, scoring):
            # size input splits for cores, not for 128MB-IO clusters
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
        },
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    t0 = time.time()
    linking_pipeline(spark, sf_dir).count()
    dt = time.time() - t0
    spark.stop()
    return dt, n_docs


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    if "--scaling" in sys.argv:
        mult = int(os.environ.get("XLINK_SCALE_MULT", "16"))
        reps = int(os.environ.get("XLINK_SCALE_REPS", "3"))
        scaled_dir = _build_scaled_corpus(mult)
        results = {}
        # interleave core levels (8,32,8,32,...) so ambient-load drift hits
        # both levels symmetrically instead of biasing one
        runs: dict[int, list] = {8: [], 32: []}
        for _rep in range(reps):
            for cores in (8, 32):
                load1 = os.getloadavg()[0]
                dt, n_docs = run_flagship(f"local[{cores}]", cores, scaled_dir)
                runs[cores].append(
                    {
                        "wall_sec": round(dt, 3),
                        "docs_per_sec": round(n_docs / dt, 1),
                        "ambient_load1_before": round(load1, 2),
                    }
                )
        for cores in (8, 32):
            rs = sorted(r["docs_per_sec"] for r in runs[cores])
            # true median (mean of middle two when even) — rs[len//2] would
            # silently report the MAX for 2 reps, defeating the load-robust
            # second statistic this field exists to provide
            mid = len(rs) // 2
            median = rs[mid] if len(rs) % 2 else round((rs[mid - 1] + rs[mid]) / 2, 1)
            ws = sorted(r["wall_sec"] for r in runs[cores])
            w_med = ws[mid] if len(ws) % 2 else round((ws[mid - 1] + ws[mid]) / 2, 3)
            # headline fields carry the MEDIAN (load-robust, comparable with
            # the single-run numbers earlier rounds recorded under the same
            # names); best-of-N lives under explicit *_best names
            results[cores] = {
                "n_docs": n_docs,
                "runs": runs[cores],
                "docs_per_sec": median,
                "docs_per_sec_best": max(rs),
                "wall_sec": w_med,
                "wall_sec_best": min(ws),
            }
        tput_eff = results[32]["docs_per_sec"] / results[8]["docs_per_sec"] / 4.0
        best_eff = (
            results[32]["docs_per_sec_best"]
            / results[8]["docs_per_sec_best"]
            / 4.0
        )
        cpu_ceiling, bw_ceiling = _hardware_ceilings()
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_local8_vs_local32",
                    "value": round(tput_eff, 3),
                    "unit": "ratio",
                    "sf": sf,
                    "corpus_multiplier": mult,
                    "reps_per_level": reps,
                    "value_best": round(best_eff, 3),
                    "local8": results[8],
                    "local32": results[32],
                    "speedup_8_to_32": round(
                        results[32]["docs_per_sec"] / results[8]["docs_per_sec"], 2
                    ),
                    # single-box calibration: thread-scaling ceilings of THIS
                    # machine for compute-bound and memory-bandwidth-bound
                    # work. A multi-executor cluster adds a memory bus per
                    # node; this sandbox shares one — the honest reference
                    # point for the ratio above is the bandwidth ceiling.
                    "hw_cpu_scaling_ceiling": cpu_ceiling,
                    "hw_membw_scaling_ceiling": bw_ceiling,
                    "efficiency_vs_membw_ceiling": round(tput_eff / bw_ceiling, 3)
                    if bw_ceiling
                    else None,
                }
            )
        )
        return
    _headline(sf)


def _hardware_ceilings() -> tuple[float, float]:
    """Measure this box's own 8→32 thread-scaling limits.

    Returns (cpu_bound_efficiency, membw_bound_efficiency), each =
    speedup/4 for 8 vs 32 independent processes."""
    import multiprocessing as mp

    import numpy as np

    def burn(v, barrier):
        x = 0
        barrier.wait()
        t0 = time.time()
        while time.time() - t0 < 3:
            x += 1
        v.value = x

    def stream(v, barrier):
        # allocation-free triad: temps would turn this into a kernel
        # page-fault contention test instead of a DRAM bandwidth test;
        # all pages touched before the barrier
        a = np.ones(8_000_000, dtype=np.float64)
        b = np.ones_like(a)
        t = np.ones_like(a)
        np.add(a, b, out=a)
        barrier.wait()
        t0 = time.time()
        n = 0
        while time.time() - t0 < 3:
            np.multiply(b, 2.0, out=t)
            np.add(a, t, out=a)
            n += 1
        v.value = n

    out = []
    for fn in (burn, stream):
        rates = {}
        for procs in (8, 32):
            best = 0
            for _rep in range(2):  # capacities: best-of to shed system noise
                barrier = mp.Barrier(procs)
                vals = [mp.Value("q", 0) for _ in range(procs)]
                ps = [mp.Process(target=fn, args=(v, barrier)) for v in vals]
                [p.start() for p in ps]
                [p.join() for p in ps]
                best = max(best, sum(v.value for v in vals))
            rates[procs] = best
        out.append(round(rates[32] / rates[8] / 4.0, 3))
    return out[0], out[1]


def _headline(sf: str) -> None:
    times, times_warm, n_docs = run_suite(f"local[{CPUS}]", CPUS)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_warm": times_warm,
                "sf": sf,
                "docs_per_sec": round(n_docs / times["linking_pipeline"], 1),
                "n_docs": n_docs,
            }
        )
    )


if __name__ == "__main__":
    main()
