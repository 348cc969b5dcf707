"""Same-session A/B of bench.py: HEAD vs a baseline commit.

Round-3 verdict ask #4: the per-round BENCH_r{N}.json headline is a
single draw from a host whose wall times vary up to 3x between
identical runs, so a cross-round "regression" (or "win") on paper is
uninterpretable. This tool measures both code versions back-to-back,
interleaved, in ONE session: the baseline commit is checked out into a
temporary read-only git worktree, bench.py runs alternately from HEAD
and the worktree (fresh process each), and the min wall per variant is
the comparison. Writes BENCH/bench_ab.json.

Usage: python tools/bench_ab.py [baseline_commit] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DEFAULT_BASELINE = "82667fc"   # round-3 final commit
WORKTREE = Path("/tmp/sparkdedup_ab_baseline")


def run_bench(cwd: Path, sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    p = subprocess.run([sys.executable, "bench.py"], cwd=str(cwd), env=env,
                       capture_output=True, text=True, timeout=1800)
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    baseline = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_BASELINE
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not WORKTREE.exists():
        subprocess.run(["git", "worktree", "add", "--detach",
                        str(WORKTREE), baseline],
                       cwd=str(REPO), check=True, capture_output=True)
    runs = {"head": [], "baseline": []}
    for _ in range(repeats):
        for name, cwd in (("head", REPO), ("baseline", WORKTREE)):
            r = run_bench(cwd, sf_dir, cpus)
            print(name, r["value"], r["queries"], flush=True)
            runs[name].append(r)
    best = {k: min(rs, key=lambda r: r["value"]) for k, rs in runs.items()}
    payload = {
        "baseline_commit": baseline,
        "sf_dir": sf_dir, "cpus": cpus,
        "statistic": "min total over interleaved repeats",
        "best": {k: {"total_sec": v["value"], "queries": v["queries"]}
                 for k, v in best.items()},
        "head_over_baseline": round(
            best["head"]["value"] / best["baseline"]["value"], 3),
        "all_runs": {k: [r["value"] for r in rs] for k, rs in runs.items()},
    }
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "bench_ab.json").write_text(
        json.dumps(payload, indent=2))
    print(json.dumps(payload["best"] | {
        "head_over_baseline": payload["head_over_baseline"]}))


if __name__ == "__main__":
    main()
