"""Featurize-kernel ProcessPool scaling microbench (no Spark).

Round-3 verdict ask #8: the (8,32) saturation argument should rest on
stage-isolated data. This benchmark runs the EXACT batched featurize
kernel (`sparkdedup.functions.shingles.signatures_of_batch`) under a
plain `ProcessPoolExecutor` at {2, 8, 32} workers on the same document
set — no Spark, no shuffle, no JVM — so whatever scaling ceiling it
shows is the host's memory subsystem, not the engine's plan.

Methodology matches tools/bench_scaling.py: levels interleaved over
REPEATS rounds, min wall per level (this VM stalls unpredictably; the
minimum is the best estimate of the uncontended machine). Each worker
processes disjoint slices of documents in ~200k-char sub-batches (the
same bound the Spark UDF uses).

Writes BENCH/kernel_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_DOCS = 120_000
SEED = 42
LEVELS = (8, 2, 32)
REPEATS = 2
CHUNK = 500          # docs per task submission


def _docs() -> list[str]:
    from sparkdedup.corpus import _regions, _row
    regions = _regions(N_DOCS)
    out = []
    for i in range(N_DOCS):
        row = _row(i, N_DOCS, SEED, regions)
        if row[4]:
            out.append(row[4])
    return out


def _work(texts: list[str]) -> int:
    from sparkdedup.config import DedupConfig
    from sparkdedup.functions.shingles import signatures_of_batch
    cfg = DedupConfig(similarity="similar")
    done = 0
    # ~200k-char sub-batches, the same cap the Spark UDF streams with
    i = 0
    while i < len(texts):
        j, chars = i, 0
        while j < len(texts) and chars < 200_000:
            chars += len(texts[j])
            j += 1
        signatures_of_batch(texts[i:j], cfg.shingle_k, cfg.num_perm,
                            cfg.seed)
        done += j - i
        i = j
    return done


def one_leg(texts: list[str], workers: int) -> dict:
    chunks = [texts[i:i + CHUNK] for i in range(0, len(texts), CHUNK)]
    # confine the pool (workers fork under this mask) to exactly the
    # leg's core budget — same truthful N-core-machine model as
    # tools/bench_scaling.py round 5; unconfined, N floating workers
    # sample the whole socket's cache and the parent feeds them from a
    # 33rd core
    full = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(workers)))
    try:
        t0 = time.monotonic()
        with ProcessPoolExecutor(max_workers=workers) as ex:
            total = sum(ex.map(_work, chunks))
        wall = time.monotonic() - t0
    finally:
        os.sched_setaffinity(0, full)
    return {"workers": workers, "docs": total,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(total / wall, 1)}


def main() -> None:
    texts = _docs()
    runs: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for _ in range(REPEATS):
        for w in LEVELS:
            r = one_leg(texts, w)
            print(r, flush=True)
            runs[w].append(r)
    best = {w: min(rs, key=lambda r: r["wall_sec"])
            for w, rs in runs.items()}
    pairs = {}
    for a, b in ((2, 8), (8, 32)):
        s = best[a]["wall_sec"] / best[b]["wall_sec"]
        pairs[f"{a}->{b}"] = {"speedup": round(s, 3),
                              "scaling_efficiency": round(s / 4.0, 3)}
    payload = {"n_docs": N_DOCS, "best": best, "pairs": pairs,
               "all_runs": runs,
               "statistic": "min wall over interleaved repeats"}
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "kernel_scaling.json").write_text(
        json.dumps(payload, indent=2))
    print(json.dumps(payload["pairs"]))


if __name__ == "__main__":
    main()
