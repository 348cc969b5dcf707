"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

Each query is materialized via a count/collect so the full plan
executes; timings include Spark action latency, not session startup.

Statistic: the whole suite runs ``BENCH_REPEATS`` times (default 2) in
one session and each query reports its MINIMUM wall across repeats —
the same statistic as BENCH/bench_ab.json and BENCH/scaling.json, for
the same reason (this host stalls unpredictably: the identical suite
measured 20.9 s and 54.0 s within an hour, and single unchanged
queries vary 2.5-3.2x between back-to-back runs). Every repeat's full
timing set is published under ``"runs"`` — nothing is discarded
silently. Each repeat releases every cache it pinned
(``SearchResult.release`` + unpersist) so repeats re-execute the full
plan; only the JVM/JIT and OS page cache stay warm, which is the
steady state a resident service sees anyway.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from sparkdedup.config import DedupConfig  # noqa: E402
from sparkdedup.corpus import documents_as_files  # noqa: E402
from sparkdedup.functions import text as TX  # noqa: E402
from sparkdedup.operators.lsh import candidate_pairs, dedup_pairs  # noqa: E402
from sparkdedup.operators.similarity import cosine_topk_vectorized  # noqa: E402
from sparkdedup.plans.pipeline import (build_signatures,  # noqa: E402
                                       search_clusters)
from sparkdedup.session import get_spark  # noqa: E402


def run_suite(spark, sf_dir: str, docs, emb, files,
              cfg: DedupConfig) -> dict[str, float]:
    """One full pass over the headline queries; leaves no cached state
    behind (so a following pass re-executes every plan)."""
    timings: dict[str, float] = {}

    def bench(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # q1: signature build (scan -> validate -> sha256 -> MinHash/SimHash)
    sigs_cache = {}

    def q1():
        sigs, invalid = build_signatures(spark, cfg, files)
        sigs = sigs.persist()
        sigs.count()
        sigs_cache["sigs"], sigs_cache["invalid"] = sigs, invalid

    bench("q1_signatures", q1)

    # q2: LSH banding candidate generation + cross-band dedup
    bench("q2_lsh_pairs",
          lambda: dedup_pairs(candidate_pairs(sigs_cache["sigs"], cfg))
          .count())

    # q3: full search (exact + near + containment -> CC -> ranking)
    res_cache = {}

    def q3():
        res = search_clusters(sigs_cache["sigs"], sigs_cache["invalid"], cfg)
        res.ranked.count()
        res_cache["res"] = res

    bench("q3_search_clusters", q3)

    # q4: exact cosine top-k (20 queries, vectorized brute force)
    bench("q4_cosine_topk",
          lambda: cosine_topk_vectorized(
              emb, emb.filter(F.col("vec_id") < 20), k=5).count())

    # q5: text analytics sweep (lang-id + quality + tokens, one pass)
    bench("q5_text_stats",
          lambda: docs.select(
              TX.lang_id(F.col("text")).alias("pred"),
              TX.quality_score(F.col("text")).alias("q"),
              TX.ws_token_count(F.col("text")).alias("t"))
          .groupBy("pred").agg(F.avg("q"), F.sum("t")).count())

    res_cache["res"].release()
    sigs_cache["sigs"].unpersist()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "2")))
    spark = get_spark(app_name="sparkdedup-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # size shuffle partitioning to the input: tiny sf dirs are fixed-
    # overhead-bound at corpus-scale partition counts
    n_docs = docs.count()
    parts = max(8, min(int(cpus), n_docs // 1000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    files = documents_as_files(spark, sf_dir)
    cfg = DedupConfig(similarity="similar", containment=True)

    runs = [run_suite(spark, sf_dir, docs, emb, files, cfg)
            for _ in range(repeats)]
    best = {q: min(r[q] for r in runs) for q in runs[0]}
    total = round(sum(best.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "statistic": f"per-query min over {repeats} in-session repeats",
        "runs": runs,
    }))


if __name__ == "__main__":
    main()
