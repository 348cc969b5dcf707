"""Suffix-array containment stage — difPy's ``rotate`` analogue (O10).

Reference behavior: with ``rotate=True`` difPy re-tests each pair under
rotations (`/root/reference/difPy/dif.py:697-717`) to catch transformed
duplicates the plain metric misses. For text/code the analogous "missed
transform" is CONTAINMENT: file A verbatim inside a larger file B —
shingle Jaccard between A and B is ~|A|/|B| and falls under the
threshold, so the LSH stage never pairs them.

Two stages, both distributed:

1. **Candidate generation** via bottom-sketch inverted index. If
   A ⊆ B then shingles(A) ⊆ shingles(B), so A's MINIMUM shingle hash is
   an element of B's shingle set; it lands in B's bottom-t sketch with
   probability ≈ min(1, t·|A|/|B|). We index every file's bottom-t
   hashes (t rows/file — linear) and probe with every file's s smallest
   hashes; an equi-join on the hash plus ``n_chars_small < n_chars_big``
   yields candidates. Probabilistic recall, tunable via t/s, never a
   cross join.
2. **Exact verification** with a per-big-file SUFFIX ARRAY
   (rank-doubling construction, numpy argsort, O(n log^2 n)): pattern
   lookup is binary search over suffixes. Runs inside ``mapInPandas`` on
   Arrow batches; each big file's SA is built once per batch group.

Emits edges ``(src=big, dst=small, dist=1-|A|/|B|, kind='contained')``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkdedup.config import DedupConfig
from sparkdedup.functions.shingles import normalize_text


def build_suffix_array(s: bytes) -> np.ndarray:
    """Rank-doubling suffix array (sorted suffix start offsets)."""
    n = len(s)
    if n == 0:
        return np.array([], dtype=np.int64)
    rank = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) using lexsort
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        tmp[sa[0]] = 0
        prev = sa[0]
        for idx in range(1, n):
            cur = sa[idx]
            tmp[cur] = tmp[prev] + (
                (rank[cur] != rank[prev]) or (second[cur] != second[prev]))
            prev = cur
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def sa_contains(text: bytes, sa: np.ndarray, pattern: bytes) -> bool:
    """Binary search ``pattern`` among the suffixes of ``text``."""
    lo, hi = 0, len(sa)
    m = len(pattern)
    if m == 0 or m > len(text):
        return False
    while lo < hi:
        mid = (lo + hi) // 2
        start = sa[mid]
        if text[start:start + m] < pattern:
            lo = mid + 1
        else:
            hi = mid
    if lo == len(sa):
        return False
    start = sa[lo]
    return text[start:start + m] == pattern


def containment_candidates(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Bottom-sketch index join -> candidate (small_id, big_id) pairs."""
    index = sigs.select(
        F.col("file_id").alias("big_id"),
        F.col("n_chars").alias("big_chars"),
        F.explode("bottom_sketch").alias("h"),
    )
    probe = sigs.filter(F.col("n_chars") >= cfg.min_contain_chars).select(
        F.col("file_id").alias("small_id"),
        F.col("n_chars").alias("small_chars"),
        F.explode(F.slice("bottom_sketch", 1, cfg.probe_s)).alias("h"),
    )
    return (probe.join(index, "h")
            .filter(F.col("small_chars") < F.col("big_chars"))
            .filter(F.col("small_id") != F.col("big_id"))
            .select("small_id", "big_id", "small_chars", "big_chars")
            .dropDuplicates(["small_id", "big_id"]))


_VERIFY_SCHEMA = T.StructType([
    T.StructField("src", T.LongType(), False),
    T.StructField("dst", T.LongType(), False),
    T.StructField("dist", T.DoubleType(), False),
    T.StructField("kind", T.StringType(), False),
])


def verify_containment(cands: DataFrame, sigs: DataFrame) -> DataFrame:
    """Exact substring check over normalized content via suffix arrays.

    Joins content for both sides (bounded: only candidate pairs), groups
    Arrow batches by big_id so each suffix array is built once, then
    binary-searches every probing pattern.
    """
    content = sigs.select("file_id", "content")
    joined = (cands
              .join(content.withColumnRenamed("content", "small_content"),
                    cands["small_id"] == content["file_id"]).drop("file_id")
              .join(content.withColumnRenamed("content", "big_content")
                    .alias("c2"),
                    F.col("big_id") == F.col("c2.file_id")).drop("file_id")
              # co-locate candidates of the same big file into one task
              .repartition("big_id"))

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"src": [], "dst": [], "dist": [], "kind": []}
            for big_id, grp in b.groupby("big_id", sort=False):
                big = normalize_text(grp["big_content"].iloc[0]).encode()
                sa = build_suffix_array(big)
                for small_id, small_content, small_chars, big_chars in zip(
                        grp["small_id"], grp["small_content"],
                        grp["small_chars"], grp["big_chars"]):
                    pat = normalize_text(small_content).encode()
                    if len(pat) and sa_contains(big, sa, pat):
                        out["src"].append(int(big_id))
                        out["dst"].append(int(small_id))
                        out["dist"].append(1.0 - len(pat) / max(len(big), 1))
                        out["kind"].append("contained")
            yield pd.DataFrame(out)

    return joined.mapInPandas(check, schema=_VERIFY_SCHEMA)


def containment_edges(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    return verify_containment(containment_candidates(sigs, cfg), sigs)
