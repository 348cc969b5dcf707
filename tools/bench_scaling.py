"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N vs 4N executors, throughput
scaling efficiency >= 0.8) cannot use a real cluster in this sandbox;
per driver instructions it is evidenced by running the SAME job on the
SAME input at two parallelism levels: local[8] vs local[32], identical
shuffle partitioning, fresh JVM per run (subprocess).

Usage:
    python tools/bench_scaling.py            # orchestrate both runs
    python tools/bench_scaling.py --run 8    # one measured run (internal)

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

N_FILES = 200_000
SEED = 42
PARTITIONS = 128          # identical physical plan at both levels
CORPUS = REPO / ".bench" / f"corpus_{N_FILES}.parquet"


def prepare_corpus() -> None:
    """Generate the deterministic corpus parquet once (both runs read
    the same files; generation time is excluded from the measurement)."""
    if (CORPUS / "_SUCCESS").exists():
        return
    from sparkdedup.corpus import files_table
    from sparkdedup.session import get_spark
    spark = get_spark(app_name="bench-corpus", master="local[32]",
                      shuffle_partitions=PARTITIONS)
    (files_table(spark, n=N_FILES, seed=SEED, partitions=PARTITIONS)
     .write.mode("overwrite").parquet(str(CORPUS)))
    spark.stop()


def measured_run(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from sparkdedup.config import DedupConfig
    from sparkdedup.plans.pipeline import run as run_pipeline
    from sparkdedup.session import get_spark

    spark = get_spark(app_name=f"bench-scaling-{cpus}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    files = spark.read.parquet(str(CORPUS))
    cfg = DedupConfig(similarity="similar", containment=True)
    t0 = time.monotonic()
    res = run_pipeline(spark, cfg, files)
    n_clustered = res.clusters.count()
    n_edges = res.edges.count()
    wall = time.monotonic() - t0
    out = {
        "cpus": cpus,
        "n_files": N_FILES,
        "wall_sec": round(wall, 2),
        "files_per_sec": round(N_FILES / wall, 1),
        "clustered_files": n_clustered,
        "edges": n_edges,
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        print(json.dumps(measured_run(int(sys.argv[2]))))
        return

    prepare_corpus()
    results = {}
    # cold JVM per level; 32 first so any residual OS cache warmth
    # favors the SMALL run, biasing efficiency DOWN (conservative).
    for cpus in (32, 8):
        p = subprocess.run(
            [sys.executable, __file__, "--run", str(cpus)],
            capture_output=True, text=True, cwd=str(REPO), timeout=3600)
        line = p.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(results[cpus])

    t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
    speedup = t8 / t32
    efficiency = speedup / 4.0
    # correctness invariant: identical outputs at both parallelism levels
    assert results[8]["clustered_files"] == results[32]["clustered_files"]
    assert results[8]["edges"] == results[32]["edges"]

    payload = {
        "n_files": N_FILES,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(payload, indent=2))
    (bench_dir / "BASELINE.md").write_text(f"""# BENCH — scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox evidence (no real cluster available): the same
dedup job (signatures -> exact + LSH + containment edges -> connected
components -> ranking) on the same {N_FILES:,}-file deterministic
corpus (seed={SEED}), identical {PARTITIONS}-partition physical plan,
fresh JVM per run, at local[8] vs local[32] on a 32-core host.

| parallelism | wall (s) | files/sec | clustered files | edges |
|---|---|---|---|---|
| local[8] (N) | {t8} | {results[8]['files_per_sec']} | {results[8]['clustered_files']} | {results[8]['edges']} |
| local[32] (4N) | {t32} | {results[32]['files_per_sec']} | {results[32]['clustered_files']} | {results[32]['edges']} |

**Speedup 8->32: {speedup:.2f}x; scaling efficiency: {efficiency:.3f}**
(target >= 0.8). Outputs are identical at both levels (cluster and
edge counts asserted equal).

Reference point: difPy's README worked example processes 3,232 files
in 2.15 s build + 5.14 s search (~443 files/s end-to-end, 5 processes,
O(n^2) pairs — `/root/reference/README.md:118-136`); it cannot scale
past a single machine. This engine sustains
{results[32]['files_per_sec']:,} files/s end-to-end on 32 local cores
with an O(n x bands) candidate stage that partitions across executors.

Reproduce: `python tools/bench_scaling.py`.
""")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
