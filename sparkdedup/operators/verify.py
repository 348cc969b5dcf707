"""Pair verification: SimHash Hamming pre-cut + MinHash Jaccard estimate
+ similarity threshold (difPy O10-O13).

Reference behavior: difPy computes MSE per candidate pair — optionally
minimized over rotations (`/root/reference/difPy/dif.py:697-717`; note
the loop at :701 covers 0/90/180 only, never the documented 270 —
SURVEY.md §2.2) — then keeps pairs with ``mse <= similarity``
(`dif.py:450,461,497-507`). Our distance is ``1 - estimated Jaccard``
where the estimate is the fraction of agreeing MinHash lanes; SimHash
Hamming distance (``bit_count(xor)``) is the cheap first cut, exactly as
difPy's ``same_dim``/equality short-circuits run before float MSE.

Everything here is JVM builtins inside whole-stage codegen —
``bit_count``/``xor`` for Hamming, ``zip_with``+``aggregate`` for lane
agreement. No Python in the per-pair hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig


def hamming_filter(pairs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Drop pairs whose 64-bit SimHash Hamming distance exceeds
    ``simhash_ham_max`` — runs before the signature join, on columns
    already in the shuffle."""
    ham = F.bit_count(F.col("simhash_src").bitwiseXOR(F.col("simhash_dst")))
    return pairs.filter(ham <= cfg.simhash_ham_max)


def jaccard_edges(pairs: DataFrame, sigs: DataFrame,
                  cfg: DedupConfig) -> DataFrame:
    """Join MinHash signatures for both sides and keep pairs with
    ``dist = 1 - est_jaccard <= cfg.threshold``.

    Emits ``(src, dst, dist, kind='near', gen)``. Two hash joins on
    file_id (signature table is hash-partitioned on it); the lane
    agreement is a single vectorized array expression.
    """
    mh = sigs.select("file_id", "minhash")
    joined = (pairs
              .join(mh.withColumnRenamed("minhash", "mh_src"),
                    pairs["src"] == mh["file_id"]).drop("file_id")
              .join(mh.withColumnRenamed("minhash", "mh_dst").alias("m2"),
                    F.col("dst") == F.col("m2.file_id")).drop("file_id"))
    # minhash is an array<long> column: lane agreement is one zip_with
    # pass inside whole-stage codegen. (The former packed-binary
    # encoding needed 2*num_perm substring() byte-array allocations per
    # pair — measured 6x slower and GC-noisy at 1M pairs, round 3.)
    agree = F.aggregate(
        F.zip_with("mh_src", "mh_dst",
                   lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, x: acc + x)
    dist = F.lit(1.0) - agree.cast("double") / F.lit(float(cfg.num_perm))
    return (joined
            .withColumn("dist", dist)
            .filter(F.col("dist") <= F.lit(cfg.threshold))
            .select("src", "dst", "dist", F.lit("near").alias("kind"), "gen"))
