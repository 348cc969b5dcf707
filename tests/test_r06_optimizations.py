"""Round-6 optimization invariants.

Each optimization that touched an operator's internals gets a focused
check here: the narrow-scan widener (parallelism fix, results
unchanged), and the sort-free LSH band expansion (canonical src<dst
pairs, identical pair set to the per-row kernel truth).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.corpus import files_table
from sparkdedup.operators.lsh import candidate_pairs, dedup_pairs
from sparkdedup.plans.pipeline import build_signatures
from sparkdedup.sources.files import widen_narrow_scan


def test_widen_narrow_scan_preserves_rows_and_widens(spark):
    df = files_table(spark, n=300, seed=3, partitions=1)
    wide = widen_narrow_scan(df)
    assert wide.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    assert sorted(r["path"] for r in wide.collect()) == \
        sorted(r["path"] for r in df.collect())


def test_widen_narrow_scan_never_narrows(spark):
    target = spark.sparkContext.defaultParallelism
    df = files_table(spark, n=300, seed=3, partitions=target + 4)
    assert widen_narrow_scan(df) is df


def test_candidate_pairs_are_canonical_and_deduped(spark):
    """Sort-free band expansion: every emitted pair is src < dst and
    appears once after cross-band dedup, with a valid gen label."""
    cfg = DedupConfig(similarity="similar")
    sigs, _ = build_signatures(spark, cfg, files_table(spark, n=600, seed=5))
    pairs = dedup_pairs(candidate_pairs(sigs, cfg)).collect()
    assert pairs, "corpus plants near-dups; expansion must emit pairs"
    seen = set()
    for r in pairs:
        assert r["src"] < r["dst"]
        assert r["gen"] in ("allpairs", "star")
        assert (r["src"], r["dst"]) not in seen
        seen.add((r["src"], r["dst"]))


def test_signatures_partitioning_invariant(spark):
    """build_signatures output is identical whether the source arrives
    as 1 partition (widened) or many (left alone)."""
    cfg = DedupConfig(similarity="similar")
    a, _ = build_signatures(spark, cfg, files_table(spark, n=200, seed=9,
                                                    partitions=1))
    b, _ = build_signatures(spark, cfg, files_table(spark, n=200, seed=9,
                                                    partitions=40))
    cols = ["file_id", "sha256", "simhash", "n_shingles"]
    ra = sorted(map(tuple, a.select(*cols).collect()))
    rb = sorted(map(tuple, b.select(*cols).collect()))
    assert ra == rb
