"""Stage-level profile of the full dedup job via the Spark event log.

Runs build_signatures -> search_clusters on a cached corpus with
``spark.eventLog.enabled`` and then aggregates per-stage task time from
the event-log JSON, printing the top stages by executor task time with
their call sites. This is how we attribute wall-time inside the
edge-materialization phase (band shuffle vs minhash join vs containment
SA verify vs edge agg) without the live UI (disabled in benchmarks).

Usage:
    python tools/profile_stages.py [n_files] [cpus]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_job(n_files: int, cpus: int, evdir: str) -> dict:
    from sparkdedup.config import DedupConfig
    from sparkdedup.plans.pipeline import build_signatures, search_clusters
    from sparkdedup.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=128,
        extra_conf={"spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": evdir})
    spark.sparkContext.setLogLevel("ERROR")
    corpus = REPO / ".bench" / f"corpus_{n_files}.parquet"
    if (corpus / "_SUCCESS").exists():
        files = spark.read.parquet(str(corpus))
    else:
        from sparkdedup.corpus import files_table
        files = files_table(spark, n=n_files, seed=42, partitions=128)
    cfg = DedupConfig(similarity="similar", containment=True)
    t0 = time.monotonic()
    sigs, invalid = build_signatures(spark, cfg, files)
    sigs = sigs.persist()
    sigs.count()
    t_feat = time.monotonic() - t0
    res = search_clusters(sigs, invalid, cfg)
    n_clusters = res.clusters.count()
    wall = time.monotonic() - t0
    out = {"wall": round(wall, 1), "featurize": round(t_feat, 1),
           "stages": dict(res._timings), "clusters": n_clusters}
    spark.stop()
    return out


def parse_eventlog(evdir: str, top: int = 25) -> list[tuple]:
    """(task-seconds, wall-seconds, n_tasks, MB shuffled, stage name).

    Also prints a whole-app shuffle-byte total — the round-4 metric for
    "edge-phase bytes reduced": shuffle WRITE bytes count each exchange
    once (reads double-count re-read cached exchanges)."""
    rows = []
    totals = {"write_mb": 0.0, "read_mb": 0.0, "task_sec": 0.0}
    files = [p for p in Path(evdir).rglob("events_*") if p.is_file()]
    for f in files:
        by_stage: dict = {}
        task_time: dict = defaultdict(float)
        n_tasks: dict = defaultdict(int)
        sh_write: dict = defaultdict(float)
        sh_read: dict = defaultdict(float)
        if f.name.endswith(".zstd"):
            import pyarrow as pa
            with pa.CompressedInputStream(pa.OSFile(str(f)), "zstd") as s:
                text = s.read().decode(errors="replace")
            lines = text.splitlines()
        else:
            lines = f.open(errors="replace")
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                wall = (si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)) / 1e3
                by_stage[sid] = (si["Stage Name"].split("\n")[0], wall)
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                task_time[sid] += (ti.get("Finish Time", 0)
                                   - ti.get("Launch Time", 0)) / 1e3
                n_tasks[sid] += 1
                tm = ev.get("Task Metrics") or {}
                sw = (tm.get("Shuffle Write Metrics") or {})
                sr = (tm.get("Shuffle Read Metrics") or {})
                sh_write[sid] += sw.get("Shuffle Bytes Written", 0) / 1e6
                sh_read[sid] += (sr.get("Local Bytes Read", 0)
                                 + sr.get("Remote Bytes Read", 0)) / 1e6
        for sid, (name, wall) in by_stage.items():
            rows.append((task_time[sid], wall, n_tasks[sid],
                         sh_write[sid] + sh_read[sid], f"s{sid} {name}"))
            totals["write_mb"] += sh_write[sid]
            totals["read_mb"] += sh_read[sid]
            totals["task_sec"] += task_time[sid]
    rows.sort(reverse=True)
    print(json.dumps({"totals": {k: round(v, 1)
                                 for k, v in totals.items()}}))
    return rows[:top]


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    evdir = tempfile.mkdtemp(prefix="sparkdedup-ev-")
    out = run_job(n_files, cpus, evdir)
    print(json.dumps(out))
    print(f"{'task-sec':>9} {'wall-sec':>9} {'tasks':>6} {'shuf-MB':>8}  stage")
    for tsec, wall, n, mb, name in parse_eventlog(evdir):
        print(f"{tsec:9.1f} {wall:9.1f} {n:6d} {mb:8.1f}  {name[:100]}")


if __name__ == "__main__":
    main()
