"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N vs 4N executors, throughput
scaling efficiency >= 0.8) cannot use a real cluster in this sandbox;
per driver instructions it is evidenced by running the SAME job on the
SAME input at two parallelism levels (local[2] vs local[8] as the
headline N-vs-4N pair; local[8] vs local[32] documents the single-
socket saturation ceiling), identical shuffle partitioning, fresh JVM
per run (subprocess).

Each leg is CONFINED to exactly its core budget with ``taskset -c
0-(N-1)`` (round 5). Without confinement the small legs are subsidized
by the idle 30 cores: Spark ``local[2]`` caps TASK slots at 2, but the
JVM still sizes GC/JIT pools for 32 cores (Java 17 reads
sched_getaffinity), and GC, the Arrow writer threads feeding the
Python workers, Netty and the scheduler all run on cores a real
2-core executor would not have. An N-core EXECUTOR in a real cluster
pays all of that
inside its N cores, which is exactly what the cpuset models; the
unconfined ratio structurally understates cluster scaling.

Methodology — min over interleaved repeats: this shared VM's wall
times vary up to 2x BETWEEN IDENTICAL RUNS minutes apart (round-3
measurements: the same local[8] leg measured 784 s and 1053 s in one
hour; a fixed 1M-row query measured 10.3-112 s across four
back-to-back repeats). A single A/B leg pair is therefore a lottery
draw on host condition, and either direction of bias is possible. The
levels are run INTERLEAVED (8, 2, 32, 8, 2, 32, ...) so every level
samples every condition window, and the per-level statistic is the
MINIMUM wall time — the best estimate of the uncontended machine,
and the only statistic whose ratio is meaningful when the noise is
strictly additive stalls. All repeats are reported in
BENCH/scaling.json; nothing is discarded silently.

Usage:
    python tools/bench_scaling.py            # orchestrate all runs
    python tools/bench_scaling.py --run 8 1200000   # one leg (internal)

Writes BENCH/BASELINE.md and BENCH/scaling.json.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SEED = 42
PARTITIONS = 128          # identical physical plan at every level
N_FILES = 1_200_000       # below ~1M the serial floor (JVM/JIT/planning)
                          # dominates and understates scaling — see
                          # BENCH/BASELINE.md round-2 note
LEVELS = (8, 2, 32)       # interleaving order; pairs below read mins
REPEATS = 2
PAIRS = [(2, 8), (8, 32)]


def corpus_path(n_files: int) -> Path:
    return REPO / ".bench" / f"corpus_{n_files}.parquet"


def prepare_corpus(n_files: int) -> None:
    """Generate the deterministic corpus parquet once (all runs read
    the same files; generation time is excluded from the measurement)."""
    corpus = corpus_path(n_files)
    if (corpus / "_SUCCESS").exists():
        return
    from sparkdedup.corpus import files_table
    from sparkdedup.session import get_spark
    spark = get_spark(app_name="bench-corpus", master="local[32]",
                      shuffle_partitions=PARTITIONS)
    (files_table(spark, n=n_files, seed=SEED, partitions=PARTITIONS)
     .write.mode("overwrite").parquet(str(corpus)))
    spark.stop()


def measured_run(cpus: int, n_files: int) -> dict:
    from sparkdedup.config import DedupConfig
    from sparkdedup.plans.pipeline import build_signatures, search_clusters
    from sparkdedup.session import get_spark

    spark = get_spark(app_name=f"bench-scaling-{cpus}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    files = spark.read.parquet(str(corpus_path(n_files)))
    cfg = DedupConfig(similarity="similar", containment=True)
    t0 = time.monotonic()
    # phase 1: scan + validate + featurize (the stage whose cost
    # dominates at 10^12-file scale — it touches every content byte)
    sigs, invalid = build_signatures(spark, cfg, files)
    sigs = sigs.persist()
    sigs.count()
    t_featurize = time.monotonic() - t0
    # phase 2: the rest of the job (edges -> CC -> ranking)
    res = search_clusters(sigs, invalid, cfg)
    n_clustered = res.clusters.count()
    n_edges = res.edges.count()
    wall = time.monotonic() - t0
    out = {
        "cpus": cpus,
        "n_files": n_files,
        "wall_sec": round(wall, 2),
        "featurize_sec": round(t_featurize, 2),
        "stage_sec": {k: round(v, 2) for k, v in res._timings.items()},
        "files_per_sec": round(n_files / wall, 1),
        "featurize_files_per_sec": round(n_files / t_featurize, 1),
        "clustered_files": n_clustered,
        "edges": n_edges,
    }
    spark.stop()
    return out


def _one_leg(cpus: int, n_files: int) -> dict:
    # confine the WHOLE process tree (JVM + pyspark workers) to the
    # leg's core budget — the truthful model of an N-core executor;
    # Java 17 sizes GC/JIT/netty pools from the cpuset, python workers
    # inherit it. Cores 0..N-1 at every level for run-to-run symmetry.
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, __file__, "--run", str(cpus), str(n_files)]
    p = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(REPO), timeout=5400)
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    print(out, flush=True)
    return out


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--run":
        print(json.dumps(measured_run(int(sys.argv[2]), int(sys.argv[3]))))
        return

    prepare_corpus(N_FILES)
    runs: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for _ in range(REPEATS):
        for cpus in LEVELS:
            runs[cpus].append(_one_leg(cpus, N_FILES))

    # correctness invariant: identical outputs at every level and repeat
    outs = {(r["clustered_files"], r["edges"])
            for rs in runs.values() for r in rs}
    assert len(outs) == 1, f"parallelism changed results: {outs}"

    best = {c: min(rs, key=lambda r: r["wall_sec"])
            for c, rs in runs.items()}
    pair_reports = []
    for small, big in PAIRS:
        ts, tb = best[small]["wall_sec"], best[big]["wall_sec"]
        fs, fb = best[small]["featurize_sec"], best[big]["featurize_sec"]
        pair_reports.append({
            "pair": [small, big],
            "n_files": N_FILES,
            "small": best[small],
            "big": best[big],
            "full_job": {"speedup": round(ts / tb, 3),
                         "scaling_efficiency": round(ts / tb / 4.0, 3)},
            "featurize_stage": {"speedup": round(fs / fb, 3),
                                "scaling_efficiency": round(
                                    fs / fb / 4.0, 3)},
        })

    payload = {"pairs": pair_reports, "target": 0.8,
               "statistic": "min wall over interleaved repeats",
               "all_runs": runs}
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(payload, indent=2))

    # markdown rendering is delegated so re-runs cannot clobber the
    # kernel-control / task-second sections (tools/render_baseline.py)
    sys.path.insert(0, str(REPO / "tools"))
    import render_baseline
    render_baseline.main()
    print(json.dumps({"pairs": pair_reports, "target": 0.8}))


if __name__ == "__main__":
    main()
