"""Round-6 measurement harness (guide §1): per-query isolation with the
noop sink, q3 stage breakdown from SearchResult._timings, scan/task
parallelism, and CC round count. Does NOT touch bench.py (frozen).

Usage: python tools/bench_extra.py [--sf DIR] [--repeats N]
Prints one JSON document to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from sparkdedup.config import DedupConfig  # noqa: E402
from sparkdedup.corpus import documents_as_files  # noqa: E402
from sparkdedup.functions import text as TX  # noqa: E402
from sparkdedup.operators.lsh import candidate_pairs, dedup_pairs  # noqa: E402
from sparkdedup.operators.similarity import cosine_topk_vectorized  # noqa: E402
from sparkdedup.plans.pipeline import (build_signatures,  # noqa: E402
                                       search_clusters)
from sparkdedup.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="sparkdedup-bench-extra",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    n_docs = docs.count()
    parts = max(8, min(int(cpus), n_docs // 1000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    files = documents_as_files(spark, args.sf)
    cfg = DedupConfig(similarity="similar", containment=True)

    report: dict = {
        "sf": args.sf, "n_docs": n_docs,
        "scan_partitions": files.rdd.getNumPartitions(),
        "runs": [],
    }

    for rep in range(args.repeats):
        run: dict = {}

        def bench(name: str, fn):
            sc.setJobDescription(f"r6probe:{name}")
            t0 = time.monotonic()
            out = fn()
            run[name] = round(time.monotonic() - t0, 3)
            sc.setJobDescription(None)
            return out

        sigs_box: dict = {}

        def q1():
            sigs, invalid = build_signatures(spark, cfg, files)
            sigs = sigs.persist()
            sigs.count()
            sigs_box["sigs"], sigs_box["invalid"] = sigs, invalid

        bench("q1_signatures", q1)
        bench("q2_lsh_pairs",
              lambda: dedup_pairs(candidate_pairs(sigs_box["sigs"], cfg))
              .count())

        res_box: dict = {}

        def q3():
            res = search_clusters(sigs_box["sigs"], sigs_box["invalid"], cfg)
            res.ranked.count()
            res_box["res"] = res

        bench("q3_search_clusters", q3)
        run["q3_timings"] = {k: round(v, 3)
                             for k, v in res_box["res"]._timings.items()}
        run["n_edges"] = res_box["res"].edges.count()
        bench("q4_cosine_topk",
              lambda: cosine_topk_vectorized(
                  emb, emb.filter(F.col("vec_id") < 20), k=5).count())
        bench("q5_text_stats",
              lambda: docs.select(
                  TX.lang_id(F.col("text")).alias("pred"),
                  TX.quality_score(F.col("text")).alias("q"),
                  TX.ws_token_count(F.col("text")).alias("t"))
              .groupBy("pred").agg(F.avg("q"), F.sum("t")).count())

        res_box["res"].release()
        sigs_box["sigs"].unpersist()
        report["runs"].append(run)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
