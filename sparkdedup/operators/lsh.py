"""LSH banding candidate generation (difPy O6/O7/O8) — never O(n^2).

Reference behavior being replaced: difPy materializes ALL pairs —
``itertools.combinations`` under 5k files
(`/root/reference/difPy/dif.py:321-332`) and a chunked per-anchor
generator above (`dif.py:516-531`, with the off-by-one at :529 that
drops pairs with the max id — not replicated). That is the O(n^2) wall
BASELINE.json licenses us to knock down: MinHash signatures are split
into ``num_bands`` bands of ``rows_per_band`` lanes; two files collide in
a band iff those lanes agree, so candidate generation is a hash-
partitioned groupBy, linear in files x bands.

The ``same_dim`` pre-filter (dif.py:719-724) and ``in_folder`` scope
(dif.py:101-126) are folded INTO the band key (len_bucket / repo), so
cross-bucket pairs are never generated at all — stronger than difPy's
post-filter (SURVEY.md §4).

Skew (SURVEY.md §4 item 1): a band bucket of B files implies B(B-1)/2
pairs. Buckets larger than ``band_pair_cap`` emit a STAR to the bucket's
min file_id instead — linear, keeps the component connected — and are
marked ``gen='star'`` so stats can report capped buckets (no silent
caps). Everything carries only (file_id, simhash) through the shuffle;
full MinHash arrays are joined back just once, for surviving pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig


def band_hashes(cfg: DedupConfig) -> F.Column:
    """array<bigint> of per-band xxhash64 over minhash lane slices —
    JVM-side (no Python). The minhash is a packed binary column
    (functions/shingles.py), so a band slice is a substring of
    rows_per_band * 8 bytes."""
    nbytes = cfg.rows_per_band * 8
    return F.transform(
        F.sequence(F.lit(0), F.lit(cfg.num_bands - 1)),
        lambda i: F.xxhash64(
            F.substring(F.col("minhash"), i * F.lit(nbytes) + 1,
                        F.lit(nbytes)), i),
    )


def explode_bands(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(file_id, simhash[, scope cols]) x num_bands band rows."""
    cols = [F.col("file_id"), F.col("simhash"),
            F.posexplode(band_hashes(cfg)).alias("band_id", "band_hash")]
    out = sigs.select(*cols,
                      *( [F.col("len_bucket")] if cfg.same_dim else [] ),
                      *( [F.col("repo")] if cfg.in_folder else [] ))
    return out


def _band_keys(cfg: DedupConfig) -> list[str]:
    keys = ["band_id", "band_hash"]
    if cfg.same_dim:
        keys.append("len_bucket")
    if cfg.in_folder:
        keys.append("repo")
    return keys


def candidate_pairs(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Candidate edges ``(src, dst, simhash_src, simhash_dst, gen)``.

    One shuffle keys the band groupBy (window over the band key), an
    equi-join on the same key produces within-bucket pairs for small
    buckets (AQE handles residual imbalance), capped buckets take the
    star path. SimHash rides along so verification's Hamming pre-cut
    runs BEFORE any join back to the (wide) signature table.
    """
    keys = _band_keys(cfg)
    w = Window.partitionBy(*keys)
    bands = (explode_bands(sigs, cfg)
             .withColumn("_n", F.count(F.lit(1)).over(w))
             .withColumn("_root", F.min(F.struct("file_id", "simhash")).over(w))
             .filter(F.col("_n") > 1))

    # Small buckets: pairs come from a groupBy on the SAME key the
    # window just hash-partitioned on (exchange reuse — no new shuffle)
    # plus a JVM higher-order cross-product over the collected bucket,
    # bounded by band_pair_cap members. This replaces the former bucket
    # self-join: one fewer join stage per query, identical output.
    small = bands.filter(F.col("_n") <= cfg.band_pair_cap)
    grouped = small.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct("file_id", "simhash")))
        .alias("_ms"))
    ms = F.col("_ms")
    raw_pairs = F.flatten(F.transform(
        ms, lambda x, i: F.transform(
            F.slice(ms, i + F.lit(2), F.lit(cfg.band_pair_cap)),
            lambda y: F.struct(x["file_id"].alias("src"),
                               y["file_id"].alias("dst"),
                               x["simhash"].alias("simhash_src"),
                               y["simhash"].alias("simhash_dst")))))
    # SimHash Hamming cut INSIDE the pair expansion: marginal-similarity
    # pairs die during the bucket cross-product instead of being
    # materialized into the dedup shuffle (difPy's cheap-predicate-first
    # pattern, dif.py:441-449, at the physical-plan level).
    kept = F.filter(
        raw_pairs,
        lambda p: F.bit_count(p["simhash_src"].bitwiseXOR(p["simhash_dst"]))
        <= cfg.simhash_ham_max)
    pairs_small = (grouped.select(F.explode(kept).alias("_p"))
                   .select(F.col("_p.src").alias("src"),
                           F.col("_p.dst").alias("dst"),
                           F.col("_p.simhash_src").alias("simhash_src"),
                           F.col("_p.simhash_dst").alias("simhash_dst"),
                           F.lit("allpairs").alias("gen")))

    big = bands.filter(F.col("_n") > cfg.band_pair_cap)
    pairs_star = (big.filter(F.col("file_id") != F.col("_root.file_id"))
                  .select(
                      F.col("_root.file_id").alias("src"),
                      F.col("file_id").alias("dst"),
                      F.col("_root.simhash").alias("simhash_src"),
                      F.col("simhash").alias("simhash_dst"),
                      F.lit("star").alias("gen"),
                  ))
    return pairs_small.unionByName(pairs_star)


def dedup_pairs(pairs: DataFrame) -> DataFrame:
    """Cross-band dedup: a pair co-bucketing in many bands survives once.
    'allpairs' wins over 'star' so stats stay meaningful."""
    return pairs.groupBy("src", "dst").agg(
        F.first("simhash_src").alias("simhash_src"),
        F.first("simhash_dst").alias("simhash_dst"),
        F.min("gen").alias("gen"),
    )
