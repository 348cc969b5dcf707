"""Structured Streaming ingest: continuous featurize + incremental
exact-dedup for an ever-growing corpus.

The reference is batch-only: a difPy run rescans its directories from
scratch (`/root/reference/difPy/dif.py:96-149`), so keeping a dedup
index current over a growing corpus means re-paying the full decode
cost every run. A 100 TB training-data pipeline ingests continuously;
this module is the Spark-native answer:

* ``stream_signatures`` — the SAME validate/featurize lineage as the
  batch pipeline (plans/pipeline.py) applied to a ``readStream`` source.
  Every stage is stateless row-at-a-time (filter, projection, pandas
  UDF), so the streaming plan is identical to the batch plan per
  micro-batch — no retraining of semantics, one code path
  (``build_signatures``'s column set, minus the ordering-dependent
  pieces difPy never had).
* ``incremental_dedup`` — ``foreachBatch`` merge: each micro-batch is
  featurized once, appended to a parquet/Iceberg ``signatures`` table,
  and exact-dup edges are emitted for collisions WITHIN the batch and
  AGAINST the accumulated table (new file duplicates an old file =>
  edge now, no reprocessing of history). At 100 TB scale the
  accumulated side is pruned to the sha256 hash-bucket partitions the
  batch actually touches (partition pruning on ``sha_prefix``); the
  decode/featurize cost per ingested byte is paid exactly once, ever.

Checkpointing: Spark's own streaming checkpoint (offsets + foreachBatch
epoch) gives exactly-once table appends on top of the engine's
per-stage lineage (plans/checkpoint.py handles batch resume; streaming
resume is the runtime's job — same parquet seam, Iceberg-pluggable).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.functions.hashing import (with_file_id, with_length_cols,
                                          with_sha256)
from sparkdedup.functions.shingles import with_signature
from sparkdedup.plans.pipeline import SIGNATURE_COLS
from sparkdedup.sources.files import INPUT_SCHEMA, split_invalid

#: number of sha256-prefix hash buckets the signatures table is
#: partitioned by — the join against history prunes to the buckets a
#: micro-batch touches (2 hex chars = 256 buckets; at 10^12 files each
#: bucket is still independently scannable).
SHA_BUCKETS_PREFIX_LEN = 2


def read_file_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """``readStream`` over a directory of parquet files with the
    input_hint schema (repo, path, commit, lang, content)."""
    reader = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_signatures(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Streaming featurize: identical column lineage to the batch
    ``build_signatures`` (valid rows only — the invalid side-output of a
    stream belongs in its own sink, wired by ``incremental_dedup``)."""
    valid, _ = split_invalid(files, cfg)
    sigs = with_signature(
        with_length_cols(with_sha256(with_file_id(valid))), cfg)
    return sigs.select(*SIGNATURE_COLS)


def _merge_batch(batch: DataFrame, cfg: DedupConfig, sig_dir: str,
                 edges_dir: str, invalid_dir: str) -> None:
    """foreachBatch body: featurize once, append signatures, emit
    exact-dup edges vs (pruned) history + within the batch."""
    spark = batch.sparkSession
    valid, invalid = split_invalid(batch, cfg)
    (invalid.write.mode("append").parquet(invalid_dir))
    sigs = with_signature(
        with_length_cols(with_sha256(with_file_id(valid))), cfg)
    sigs = (sigs.select(*SIGNATURE_COLS)
            .withColumn("sha_prefix",
                        F.substring("sha256", 1, SHA_BUCKETS_PREFIX_LEN))
            .persist())  # ONE featurize pass feeds history-join + append
    try:
        new = sigs.select("file_id", "sha256", "sha_prefix").persist()
        n_new = new.count()
        if n_new == 0:
            return
        # edges vs HISTORY: scan only the sha-prefix partitions this
        # batch touches (partition pruning via the IN filter) and only
        # the two join columns (column pruning)
        if (Path(sig_dir) / "_SUCCESS").exists() or any(
                Path(sig_dir).glob("sha_prefix=*")):
            prefixes = [r["sha_prefix"]
                        for r in new.select("sha_prefix").distinct().collect()]
            hist = (spark.read.parquet(sig_dir)
                    .filter(F.col("sha_prefix").isin(prefixes))
                    .select(F.col("file_id").alias("src"), "sha256"))
            vs_hist = (hist.join(new.select(F.col("file_id").alias("dst"),
                                            "sha256"), "sha256")
                       .filter(F.col("src") != F.col("dst"))
                       .select("src", "dst", F.lit(0.0).alias("dist"),
                               F.lit("exact").alias("kind")))
        else:
            vs_hist = None
        # edges WITHIN the batch: same star pattern as operators/exact.py
        from sparkdedup.operators.exact import exact_edges
        within = exact_edges(sigs, cfg)
        edges = within if vs_hist is None else within.unionByName(vs_hist)
        edges.write.mode("append").parquet(edges_dir)
        (sigs.write.mode("append").partitionBy("sha_prefix")
         .parquet(sig_dir))
    finally:
        sigs.unpersist()
        new.unpersist()


def incremental_dedup(spark: SparkSession, cfg: DedupConfig,
                      source_path: str, out_dir: str,
                      trigger_available_now: bool = True,
                      max_files_per_trigger: int | None = None):
    """Run the streaming ingest+dedup job.

    Returns the started ``StreamingQuery``. With
    ``trigger_available_now`` the query drains everything currently in
    ``source_path`` and stops — the batch-boundary mode used by tests
    and backfills; without it the query runs continuously.
    Output layout under ``out_dir``:
    ``signatures/`` (partitioned by sha_prefix), ``exact_edges/``,
    ``invalid/``, ``_checkpoint/`` (Spark streaming offsets).
    """
    out = Path(out_dir)
    sig_dir = str(out / "signatures")
    edges_dir = str(out / "exact_edges")
    invalid_dir = str(out / "invalid")
    files = read_file_stream(spark, source_path, max_files_per_trigger)

    writer = (files.writeStream
              .foreachBatch(lambda b, _eid: _merge_batch(
                  b, cfg, sig_dir, edges_dir, invalid_dir))
              .option("checkpointLocation", str(out / "_checkpoint")))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
