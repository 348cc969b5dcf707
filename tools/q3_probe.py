"""Fine-grained q3 stage probe (round 6, guide §1): times each piece of
search_clusters separately — reps, LSH pair checkpoint, containment
candidate checkpoint, jaccard verify, SA verify, edge merge, CC, rank —
sequentially (no thread overlap) so each number is attributable.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from sparkdedup.config import DedupConfig  # noqa: E402
from sparkdedup.corpus import documents_as_files  # noqa: E402
from sparkdedup.operators.components import connected_components  # noqa: E402
from sparkdedup.operators.containment import containment_edges  # noqa: E402
from sparkdedup.operators.exact import exact_edges  # noqa: E402
from sparkdedup.operators.lsh import candidate_pairs, dedup_pairs  # noqa: E402
from sparkdedup.operators.ranking import rank_clusters  # noqa: E402
from sparkdedup.operators.verify import jaccard_edges  # noqa: E402
from sparkdedup.plans.pipeline import (_distinct_reps,  # noqa: E402
                                       build_signatures)
from sparkdedup.session import get_spark  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    spark = get_spark(app_name="q3probe", master=f"local[{cpus}]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    files = documents_as_files(spark, sf)
    cfg = DedupConfig(similarity="similar", containment=True)

    for rep in range(repeats):
        t: dict[str, float] = {}

        def tick(name, fn):
            t0 = time.monotonic()
            out = fn()
            t[name] = round(time.monotonic() - t0, 3)
            return out

        sigs, invalid = build_signatures(spark, cfg, files)
        sigs = sigs.persist()
        n = tick("a_sigs_count", lambda: sigs.count())
        reps = _distinct_reps(sigs, cfg, n_rows=n).persist()
        tick("b_reps_count", lambda: reps.count())
        pairs = tick("c_pairs_ckpt", lambda: dedup_pairs(
            candidate_pairs(reps, cfg)).localCheckpoint(eager=True))
        near = tick("d_jaccard_verify_count_", lambda: jaccard_edges(
            pairs, reps, cfg, pairs_materialized=True))
        tick("d_jaccard_verify_count", lambda: near.count())
        cont = tick("e_containment_edges_ckpt", lambda: containment_edges(
            reps, cfg))
        tick("f_sa_verify_count", lambda: cont.count())
        edges = (exact_edges(sigs, cfg).withColumn("gen", F.lit("exact"))
                 .unionByName(near)
                 .unionByName(cont.withColumn("gen", F.lit("contain"))))
        edges = edges.groupBy("src", "dst").agg(
            F.min("dist").alias("dist"),
            F.min_by("kind", F.struct(F.col("dist"), F.col("kind")))
            .alias("kind"),
            F.min("gen").alias("gen")).persist()
        tick("g_edges_count", lambda: edges.count())
        clusters = tick("h_cc", lambda: connected_components(edges))
        tick("h_cc_count", lambda: clusters.count())
        ranked = rank_clusters(
            clusters, sigs.select("file_id", "repo", "path", "n_chars"))
        tick("i_ranked_count", lambda: ranked.count())
        print({"rep": rep, **t}, flush=True)
        for df in (edges, reps, sigs):
            df.unpersist()


if __name__ == "__main__":
    main()
