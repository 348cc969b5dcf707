"""Structured Streaming ingest: continuous featurize + incremental
dedup (exact AND near) for an ever-growing corpus.

The reference is batch-only: a difPy run rescans its directories from
scratch (`/root/reference/difPy/dif.py:96-149`), so keeping a dedup
index current over a growing corpus means re-paying the full decode
cost every run. A 100 TB training-data pipeline ingests continuously;
this module is the Spark-native answer:

* ``stream_signatures`` — the SAME validate/featurize lineage as the
  batch pipeline (plans/pipeline.py) applied to a ``readStream`` source.
  Every stage is stateless row-at-a-time (filter, projection, pandas
  UDF), so the streaming plan is identical to the batch plan per
  micro-batch — no retraining of semantics, one code path.
* ``incremental_dedup`` — ``foreachBatch`` merge: each micro-batch is
  featurized once, appended to the ``signatures`` table, and dup edges
  are emitted for collisions WITHIN the batch and AGAINST history:

  - exact: sha256 join against the accumulated signature table, pruned
    to the sha-prefix partitions the batch actually touches;
  - near (``near_dup=True``): the batch's LSH band keys join against an
    accumulated ``bands`` table (band_id, band_hash, file_id, simhash)
    — only ids+hashes ride the shuffle — then the standard Hamming cut
    and MinHash-lane verify. History is never re-featurized: its bands
    and minhashes are read back from the tables this job wrote.

Write idempotency: every sink is written under an
``ingest_batch=<epoch>`` subdirectory with ``mode("overwrite")``.
foreachBatch is at-least-once; on replay Spark re-presents the SAME
epoch id with the same offsets, so the rewrite is byte-equivalent and
duplicate rows are impossible — effectively-once table contents
without a transactional format (on Iceberg/Delta the same seam becomes
a MERGE keyed by the epoch id).

All table probes and paths are plain URI strings handed to the Spark
reader — no local-filesystem pathlib — so the module works unchanged
on HDFS/S3 (round-2 advice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from sparkdedup.config import DedupConfig
from sparkdedup.functions.hashing import (with_file_id, with_length_cols,
                                          with_sha256)
from sparkdedup.functions.shingles import with_signature
from sparkdedup.operators.lsh import (_band_keys, candidate_pairs,
                                      dedup_pairs, explode_bands)
from sparkdedup.operators.verify import hamming_filter, jaccard_edges
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


def _table_exists(spark: SparkSession, path: str) -> bool:
    """FS-agnostic existence probe: ask the reader, not pathlib —
    works for file:/hdfs:/s3: URIs alike (round-2 advice)."""
    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException:
        return False
    except Exception as exc:  # Spark 4 raises connect-style subclasses
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return False
        raise


def _near_dup_edges(spark: SparkSession, sigs: DataFrame, cfg: DedupConfig,
                    sig_dir: str, bands_dir: str) -> DataFrame:
    """Near-dup edges for a micro-batch: within-batch LSH pairs plus
    cross-batch pairs from the accumulated band-key table, verified by
    the same Hamming + MinHash-lane machinery as the batch pipeline."""
    within = dedup_pairs(candidate_pairs(sigs, cfg))
    keys = _band_keys(cfg)
    batch_bands = explode_bands(sigs, cfg)
    if _table_exists(spark, bands_dir):
        hist = (spark.read.parquet(bands_dir)
                .select(F.col("file_id").alias("src"),
                        F.col("simhash").alias("simhash_src"),
                        *keys))
        cross = (batch_bands.join(hist, keys)
                 .filter(F.col("src") != F.col("file_id"))
                 .select("src", F.col("file_id").alias("dst"),
                         "simhash_src",
                         F.col("simhash").alias("simhash_dst"),
                         F.lit("cross").alias("gen"))
                 .groupBy("src", "dst").agg(
                     F.first("simhash_src").alias("simhash_src"),
                     F.first("simhash_dst").alias("simhash_dst"),
                     F.min("gen").alias("gen")))
        pairs = within.unionByName(cross)
    else:
        pairs = within
    # MinHash for verification: batch side is in-memory; history side
    # comes from the signature table (ids+minhash projection only) —
    # featurize is never re-run on history
    mh_batch = sigs.select("file_id", "minhash")
    if _table_exists(spark, sig_dir):
        mh_hist = spark.read.parquet(sig_dir).select("file_id", "minhash")
        mh = mh_batch.unionByName(mh_hist).dropDuplicates(["file_id"])
    else:
        mh = mh_batch
    return jaccard_edges(hamming_filter(pairs, cfg), mh, cfg).drop("gen")


def _merge_batch(batch: DataFrame, batch_id: int, cfg: DedupConfig,
                 sig_dir: str, edges_dir: str, invalid_dir: str,
                 bands_dir: str | None = None) -> None:
    """foreachBatch body: featurize once, emit exact (and optionally
    near) dup edges vs (pruned) history + within the batch, append
    signatures/bands. Every write targets ``ingest_batch=<epoch>`` with
    overwrite — replays of the same epoch are idempotent."""
    spark = batch.sparkSession
    epoch = f"ingest_batch={batch_id}"
    valid, invalid = split_invalid(batch, cfg)
    invalid.write.mode("overwrite").parquet(f"{invalid_dir}/{epoch}")
    sigs = with_signature(
        with_length_cols(with_sha256(with_file_id(valid))), cfg)
    # 'p' prefix keeps the partition value non-numeric: Spark's
    # partition-column type inference would otherwise read an all-digit
    # epoch (sha_prefix=42) as INT and a later hex one (sha_prefix=4e)
    # as STRING — conflicting types across directories break the read
    sigs = (sigs.select(*SIGNATURE_COLS)
            .withColumn("sha_prefix",
                        F.concat(F.lit("p"),
                                 F.substring("sha256", 1,
                                             SHA_BUCKETS_PREFIX_LEN)))
            .persist())  # ONE featurize pass feeds every branch below
    try:
        if sigs.count() == 0:
            return
        new = sigs.select("file_id", "sha256", "sha_prefix")
        # exact edges vs HISTORY: scan only the sha-prefix partitions
        # this batch touches (partition pruning via the IN filter) and
        # only the two join columns (column pruning)
        if _table_exists(spark, sig_dir):
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
        edges = exact_edges(sigs, cfg)
        if vs_hist is not None:
            edges = edges.unionByName(vs_hist)
        if bands_dir is not None:
            edges = edges.unionByName(
                _near_dup_edges(spark, sigs, cfg, sig_dir, bands_dir))
        edges.write.mode("overwrite").parquet(f"{edges_dir}/{epoch}")
        if bands_dir is not None:
            (explode_bands(sigs, cfg)
             .write.mode("overwrite").parquet(f"{bands_dir}/{epoch}"))
        (sigs.write.mode("overwrite").partitionBy("sha_prefix")
         .parquet(f"{sig_dir}/{epoch}"))
    finally:
        sigs.unpersist()


def incremental_dedup(spark: SparkSession, cfg: DedupConfig,
                      source_path: str, out_dir: str,
                      trigger_available_now: bool = True,
                      max_files_per_trigger: int | None = None,
                      near_dup: bool = False):
    """Run the streaming ingest+dedup job.

    Returns the started ``StreamingQuery``. With
    ``trigger_available_now`` the query drains everything currently in
    ``source_path`` and stops — the batch-boundary mode used by tests
    and backfills; without it the query runs continuously.
    ``near_dup=True`` additionally maintains the LSH band-key table and
    emits near-dup edges across batches without re-featurizing history.
    Output layout under ``out_dir`` (each sink partitioned by
    ``ingest_batch`` for idempotent epoch overwrite):
    ``signatures/`` (sub-partitioned by sha_prefix), ``exact_edges/``,
    ``bands/`` (near_dup only), ``invalid/``, ``_checkpoint/`` (Spark
    streaming offsets). ``out_dir`` may be any Hadoop-FS URI.
    """
    base = out_dir.rstrip("/")
    sig_dir = f"{base}/signatures"
    edges_dir = f"{base}/exact_edges"
    invalid_dir = f"{base}/invalid"
    bands_dir = f"{base}/bands" if near_dup else None
    files = read_file_stream(spark, source_path, max_files_per_trigger)

    writer = (files.writeStream
              .foreachBatch(lambda b, eid: _merge_batch(
                  b, eid, cfg, sig_dir, edges_dir, invalid_dir, bands_dir))
              .option("checkpointLocation", f"{base}/_checkpoint"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
