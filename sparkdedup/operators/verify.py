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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig


def hamming_filter(pairs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Drop pairs whose 64-bit SimHash Hamming distance exceeds
    ``simhash_ham_max`` — for pair DataFrames that still carry
    ``simhash_src``/``simhash_dst`` columns. The batch LSH path applies
    this cut inside the band-bucket expansion (operators/lsh.py) and
    emits narrow pairs, so it no longer calls this."""
    ham = F.bit_count(F.col("simhash_src").bitwiseXOR(F.col("simhash_dst")))
    return pairs.filter(ham <= cfg.simhash_ham_max)


def _lane_agree(a: str, b: str) -> F.Column:
    """Count of agreeing array lanes — one zip_with pass inside
    whole-stage codegen. (The former packed-binary encoding needed
    2*num_perm substring() byte-array allocations per pair — measured
    6x slower and GC-noisy at 1M pairs, round 3.)"""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, x: acc + x)


def min_agreeing_lanes(cfg: DedupConfig) -> int:
    """Smallest lane-agreement count that passes the threshold:
    ``dist = 1 - agree/num_perm <= threshold  <=>  agree >= this``."""
    return max(0, math.ceil(cfg.num_perm * (1.0 - cfg.threshold) - 1e-9))


def jaccard_edges(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig,
                  handles: list | None = None) -> DataFrame:
    """MinHash-lane verification of candidate pairs; keeps pairs with
    ``dist = 1 - est_jaccard <= cfg.threshold``. Emits
    ``(src, dst, dist, kind='near', gen)``.

    Two phases, chosen to keep shuffle bytes off the memory bus
    (round-3 verdict: the verify joins moved full 128-lane int64 arrays
    — ~1 KB a side — per candidate, and the pair->signature join
    intermediate re-shuffled them on the second key):

    1. **Digest pre-filter.** Each file's minhash collapses to an
       ``array<tinyint>`` of the low 6 bits per lane (~136 B, 8x
       narrower). Lane equality implies digest equality, so
       ``digest_agree >= min_agreeing_lanes`` is a strict SUPERSET of
       the exact pass set — no pair is lost. A disagreeing lane aliases
       with p=1/64, inflating digest agreement by ~2 lanes in 128, so
       the filter still kills ~all of the Hamming survivors that are
       below threshold.
    2. **Exact verify, late fetch.** Survivors re-join the FULL minhash
       — but the signature side is first semi-join-pruned to the
       surviving ids (AQE broadcasts the id list at runtime; no forced
       broadcast, so a huge survivor set degrades to a shuffle join,
       not a driver OOM). ``dist`` is computed from full 64-bit lanes:
       bit-identical results to a single-phase exact join.

    The survivor frame is persisted (it feeds both the id pruning and
    the final join); the caller owns release via ``handles``, the same
    contract as containment_edges.
    """
    digests = sigs.select(
        "file_id",
        F.transform("minhash",
                    lambda x: x.bitwiseAND(F.lit(63)).cast("tinyint"))
        .alias("dg"))
    j = (pairs
         .join(digests.withColumnRenamed("dg", "dg_src"),
               pairs["src"] == digests["file_id"]).drop("file_id")
         .join(digests.withColumnRenamed("dg", "dg_dst").alias("d2"),
               F.col("dst") == F.col("d2.file_id")).drop("file_id"))
    surv = (j.filter(_lane_agree("dg_src", "dg_dst")
                     >= F.lit(min_agreeing_lanes(cfg)))
            .select("src", "dst", "gen")
            .persist())
    if handles is not None:
        handles.append(surv)
    ids = surv.select(F.explode(F.array("src", "dst")).alias("file_id")) \
              .distinct()
    mh = sigs.select("file_id", "minhash").join(ids, "file_id")
    joined = (surv
              .join(mh.withColumnRenamed("minhash", "mh_src"),
                    surv["src"] == mh["file_id"]).drop("file_id")
              .join(mh.withColumnRenamed("minhash", "mh_dst").alias("m2"),
                    F.col("dst") == F.col("m2.file_id")).drop("file_id"))
    agree = _lane_agree("mh_src", "mh_dst")
    dist = F.lit(1.0) - agree.cast("double") / F.lit(float(cfg.num_perm))
    return (joined
            .withColumn("dist", dist)
            .filter(F.col("dist") <= F.lit(cfg.threshold))
            .select("src", "dst", "dist", F.lit("near").alias("kind"), "gen"))
