"""Source stage: scan + validate + extension filter (difPy O1-O3).

Reference behavior being re-expressed (NOT ported):

* O1 directory scan `/root/reference/difPy/dif.py:96-149` — glob over one
  or more roots, recursive or flat, union or per-folder. Here: a parquet /
  Iceberg table scan; multiple roots = ``unionByName`` of table reads;
  ``recursive=False`` = path-depth predicate (pushed to the scan by
  Catalyst); per-folder mode keeps ``repo`` as a scope column rather than
  issuing separate scans.
* O2 path validation `dif.py:151-159` — paths are already canonical in
  the table; rows with null/empty content go to the invalid side-output
  (difPy's decode-failure dict, `dif.py:180,243-248`).
* O3 extension allowlist `dif.py:161-173` — lowercased last suffix
  membership test; rejected rows land in invalid with reason
  'Unsupported file type' (`dif.py:753-754`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdedup.config import LANG_EXTS, DedupConfig

#: invalid-file reasons (difPy records per-path error strings,
#: dif.py:180,193,215,246-248,753-754)
REASON_NULL = "Invalid or corrupted file"
REASON_UNSUPPORTED = "Unsupported file type"

#: the BASELINE.json input_hint table shape, as a DDL string usable by
#: both batch readers and readStream (streaming requires an explicit
#: schema — no inference on a stream)
INPUT_SCHEMA = ("repo string, path string, commit string, "
                "lang string, content string")


def read_files(spark: SparkSession, cfg: DedupConfig) -> DataFrame:
    """O1: union-of-roots scan of the files table(s).

    Each entry in ``cfg.tables`` is a parquet path (``*.parquet`` /
    directory) or a registered table name. Catalyst prunes columns and
    pushes filters into the scan, so downstream ``filter``/``select``
    never read dropped columns at all.
    """
    if not cfg.tables:
        raise ValueError("Invalid directory parameter: no directory provided.")
    parts = []
    for t in cfg.tables:
        df = (spark.read.parquet(t) if ("/" in t or t.endswith(".parquet"))
              else spark.read.table(t))
        parts.append(df.select("repo", "path", "commit", "lang", "content"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not cfg.recursive:
        # flat scan: only files directly under the repo root (path has no '/')
        out = out.filter(~F.col("path").contains("/"))
    return out


def widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism when the source
    scan has fewer partitions than cores — and ONLY then.

    A single-row-group parquet file is one unsplittable scan task no
    matter what ``maxPartitionBytes`` says, so every per-row stage
    downstream of it (sha256, the featurize UDF, and — because the
    signature table is persisted with this partitioning — the map side
    of every later shuffle) runs on ONE core. One cheap shuffle of the
    raw rows right after the read fixes the whole DAG's parallelism.
    Scale guard: a source wide enough to produce >= defaultParallelism
    partitions is left untouched, so nothing is ever narrowed and the
    big case pays no extra shuffle. Row-level results are partitioning-
    independent (file_id is a content/path hash, not positional)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _ext_col() -> F.Column:
    return F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))


def split_invalid(files: DataFrame, cfg: DedupConfig
                  ) -> tuple[DataFrame, DataFrame]:
    """O2+O3: one pass splitting valid rows from the invalid side-output.

    Returns ``(valid, invalid)`` where invalid carries
    ``(repo, path, commit, reason)``. Single projection + two filters —
    Catalyst collapses the reason expression; no shuffle here.
    """
    # extension filter (O3) runs BEFORE the decode check (O4), as in the
    # reference (dif.py:161-173 precedes _generate_tensor)
    reason = F.lit(None).cast("string")
    if cfg.limit_extensions:
        allowed = sorted(LANG_EXTS.keys())
        reason = F.when(~_ext_col().isin(allowed), F.lit(REASON_UNSUPPORTED))
    reason = F.coalesce(
        reason,
        F.when(
            F.col("content").isNull() | (F.length("content") == 0)
            # NUL byte => binary blob, the difPy decode-failure analogue
            # (dif.py:243-248: unreadable image -> invalid side output)
            | F.col("content").contains("\u0000"),
            F.lit(REASON_NULL)))
    tagged = files.withColumn("_reason", reason)
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    invalid = (tagged.filter(F.col("_reason").isNotNull())
               .select("repo", "path", "commit",
                       F.col("_reason").alias("reason")))
    return valid, invalid
