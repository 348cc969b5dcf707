"""SparkSession factory tuned for the dedup workload.

Reference analogue: difPy's multiprocessing setup
(`/root/reference/difPy/dif.py:19-22,59,286,902-910`) — worker-pool
size becomes Spark parallelism; everything else (Arrow, AQE) is the
Spark-native replacement for difPy's hand-rolled chunking.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkdedup",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver env) or
    ``local[*]``. On a real cluster, pass ``master=None`` and let
    spark-submit own it; these confs are all cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 8)

    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join splitting (difPy's adaptive
        # 5000-file algorithm cutover, dif.py:321,334, done by the engine).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / mapInPandas crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Broadcast small dims automatically; 64MB is safe at 128GiB heap.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Stable timestamps/parquet behaviour for oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # Featurize cost is ~1ms/KB of content (far above parquet scan
        # cost), so input splits must outnumber cores even for modest
        # corpora: the 128 MB default gave an 8-split scan of a 600k-file
        # corpus and capped the featurize stage at 8 concurrent tasks
        # regardless of cluster size (round-3 profile). On a real 100 TB
        # table this is moot; it matters exactly on the small-file-count
        # benchmark shapes.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        # AQE coalesces post-shuffle partitions by BYTES; pair-expansion
        # and lane-agreement stages carry ~100x more CPU per byte than a
        # scan, and the 64 MB advisory size squeezed them onto 15-16
        # tasks (round-3 profile). 16 MB keeps CPU-heavy reducers at or
        # above core count without reverting to tiny-task scheduling.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(16 * 1024 * 1024))
        # cached signature tables are mostly MinHash arrays (random
        # int64s): columnar-cache compression burns CPU for ~no ratio
        # (measured 2x cache-materialization cost at 1.2M rows)
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", os.environ.get("SPARKDEDUP_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
        # single-JVM local mode: executor==driver heap. Size for cached
        # signature tables + shuffle buffers — but NOT larger: on
        # virtualized hosts with slow first-touch page faults, a big G1
        # heap keeps bump-allocating into never-touched regions and the
        # whole JVM serializes on faulting; the identical 600k job
        # measured 238 s wall at 28g vs 111 s at 10g back-to-back
        # (edge phase 161 s -> 59 s). Small enough that G1 reuses warm
        # regions, large enough that the 1.2M-file signature caches and
        # sort buffers stay in memory.
        .config("spark.driver.memory", os.environ.get("SPARKDEDUP_DRIVER_MEM", "16g"))
        # explicit broadcasts of id lists (reps anti-join, verify-stage
        # semi-joins) are gated on row counts sized well under this
        # ceiling; the 1g default would make a gated-at-4M-rows
        # broadcast a config-dependent failure on a real cluster.
        .config("spark.driver.maxResultSize", "4g")
    )
    if master:
        b = b.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
