"""Identity & content hashing — all JVM-side builtins, zero Python UDFs.

* ``file_id`` replaces difPy's dense ``img_id``
  (`/root/reference/difPy/dif.py:196,218`): ``xxhash64(repo, path,
  commit)`` is stable across runs and partitions, unlike
  ``monotonically_increasing_id`` (SURVEY.md §1.2).
* ``sha256(content)`` is the per-row invariant mandated by
  BASELINE.json ``input_hint`` and replaces difPy's exact-equality
  tensor check (`dif.py:726-731`) — see operators/exact.py.
* ``n_chars`` / ``n_lines`` / ``len_bucket`` replace the original-shape
  pre-filter dict (`dif.py:178,239,719-724`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: geometric length-bucket base for the `same_dim` analogue: files whose
#: lengths differ by >2x can never be near-dups at our thresholds.
LEN_BUCKET_LOG_BASE = 2.0


def with_file_id(df: DataFrame) -> DataFrame:
    return df.withColumn("file_id", F.xxhash64("repo", "path", "commit"))


def with_sha256(df: DataFrame, col: str = "content") -> DataFrame:
    return df.withColumn("sha256", F.sha2(F.col(col), 256))


def len_bucket(col: Column) -> Column:
    """Geometric bucket of content length (difPy `same_dim`,
    dif.py:719-724: sorted-shape equality -> here, log2 length class)."""
    return F.when(col <= 0, F.lit(0)).otherwise(
        F.floor(F.log2(col.cast("double"))).cast("int"))


def with_length_cols(df: DataFrame, col: str = "content") -> DataFrame:
    c = F.col(col)
    return (df
            .withColumn("n_chars", F.length(c).cast("long"))
            .withColumn("n_lines",
                        (F.size(F.split(c, "\n", -1))).cast("long"))
            .withColumn("len_bucket", len_bucket(F.length(c))))
