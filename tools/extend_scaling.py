"""Append one more interleaved repeat cycle to BENCH/scaling.json.

Same legs, same corpus, same confinement and interleaving order as
tools/bench_scaling.py — this just accumulates additional repeats into
``all_runs`` (nothing is dropped) and recomputes the per-level minima
and pair efficiencies, then re-renders BENCH/BASELINE.md. Use when the
2-repeat minimum is visibly condition-limited (e.g. both repeats of
one level landed in slow host windows while another level's did not).

Usage: python tools/extend_scaling.py [cycles]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BENCH = REPO / "BENCH"
sys.path.insert(0, str(REPO))
# shared with the orchestrator so a constant change there can never
# silently mix a different corpus/levels into appended repeats
from tools.bench_scaling import LEVELS, N_FILES, PAIRS  # noqa: E402


def one_leg(cpus: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           str(REPO / "tools" / "bench_scaling.py"),
           "--run", str(cpus), str(N_FILES)]
    p = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=str(REPO), timeout=5400)
    if p.returncode != 0:
        print(p.stderr, file=sys.stderr)
        raise RuntimeError(f"leg local[{cpus}] failed (rc={p.returncode})")
    out = json.loads(p.stdout.strip().splitlines()[-1])
    print(out, flush=True)
    return out


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    payload = json.loads((BENCH / "scaling.json").read_text())
    runs = {int(c): rs for c, rs in payload["all_runs"].items()}
    for _ in range(cycles):
        for cpus in LEVELS:
            runs[cpus].append(one_leg(cpus))

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
    payload["pairs"] = pair_reports
    payload["all_runs"] = runs
    (BENCH / "scaling.json").write_text(json.dumps(payload, indent=2))

    sys.path.insert(0, str(REPO / "tools"))
    import render_baseline
    render_baseline.main()
    print(json.dumps({"pairs": pair_reports, "target": 0.8}))


if __name__ == "__main__":
    main()
