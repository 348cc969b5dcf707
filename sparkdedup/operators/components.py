"""Distributed connected components over the candidate-pair edge graph.

Replaces difPy's match-group construction (O14,
`/root/reference/difPy/dif.py:533-543`): a GREEDY star fold where pairs
(0,1),(1,2) end up as {0:[1], 1:[2]} — not transitive (SURVEY.md §2.2).
We compute the true transitive closure with the alternating
small-star / large-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SOCC'14 — public literature), which converges
in O(log n) rounds and never materializes a neighborhood list:

* large-star: every node connects its STRICTLY LARGER neighbors to the
  minimum of its neighborhood (incl. itself);
* small-star: every node connects its smaller-or-equal neighbors and
  itself to the minimum neighbor.

Both phases are window-min + filter + union — per-node state is one
running min, so a 10^7-degree hub (skew cluster) never builds a list.
Each round is ``localCheckpoint``-ed to truncate lineage (SURVEY.md §4
item 2). ``cluster_id`` is the component's min ``file_id`` — stable and
deterministic across partitionings and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame, n_parts: int) -> DataFrame:
    both = (edges.select("u", "v")
            .unionByName(edges.select(F.col("v").alias("u"),
                                      F.col("u").alias("v"))))
    # explicit hash partitioning on the window key: the window's
    # ClusteredDistribution(u) is satisfied by it, so the exchange is
    # reused at the edge-sized partition count instead of planning at
    # the session's corpus-sized spark.sql.shuffle.partitions (and no
    # session conf is mutated — safe under concurrent queries)
    both = both.repartition(n_parts, "u")
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    # no dropDuplicates here: duplicate edges don't change the window
    # min, small-star dedups at the end of the round — one fewer
    # shuffle per round (round-2 job-count reduction)
    return (both.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")))


def _small_star(edges: DataFrame, n_parts: int) -> DataFrame:
    canon = edges.select(F.greatest("u", "v").alias("u"),
                         F.least("u", "v").alias("v"))
    canon = canon.repartition(n_parts, "u")
    w = Window.partitionBy("u")
    withm = canon.withColumn("m", F.min("v").over(w))
    out = (withm.filter(F.col("v") != F.col("m"))
           .select(F.col("v").alias("u"), F.col("m").alias("v"))
           .unionByName(withm.select("u", F.col("m").alias("v"))))
    return (out.filter(F.col("u") != F.col("v"))
            .repartition(n_parts, "u", "v")
            .dropDuplicates(["u", "v"]))


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive, overflow-free under ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """``edges(src, dst)`` -> ``clusters(file_id, cluster_id)``.

    Only matched nodes appear (difPy singletons never enter ``result``,
    dif.py:533-543). Driver crosses once per round for the convergence
    fingerprint — an aggregated count, not data.
    """
    spark = edges.sparkSession
    # LAZY localCheckpoint: the fingerprint aggregate is the action that
    # materializes each round's checkpoint — one driver round-trip per
    # round instead of two (eager checkpoint + separate fingerprint).
    g = (edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .dropDuplicates(["u", "v"])
         .localCheckpoint(eager=False))
    # The edge graph is typically orders of magnitude smaller than the
    # corpus; iterate at a partition count matched to the EDGE COUNT
    # alone — ~100k edges (a few MB) per partition, capped at the
    # session shuffle width. No core-count floor: each round is ~4
    # shuffle stages, so on a wide session a small graph split across
    # defaultParallelism partitions turns the loop into micro-task
    # scheduling overhead (measured on a 460k-edge graph at local[32]:
    # 32 partitions 12.4-17.8 s, 5 partitions 4.0-4.2 s — identical
    # output). A graph big enough to use every core gets every core
    # from the edge-count rule itself. The count is applied as explicit
    # repartitions inside the star steps — NOT by mutating
    # spark.sql.shuffle.partitions, which would leak into any query
    # planned concurrently on the same session (round-2 verdict).
    prev = _fingerprint(g)
    n_edges = prev[0]
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cc_parts = max(1, min(sess_parts, n_edges // 100_000 + 1))
    for _ in range(max_iter):
        g = _small_star(_large_star(g, cc_parts),
                        cc_parts).localCheckpoint(eager=False)
        cur = _fingerprint(g)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds")
    # converged: every edge is (node, root)
    return (g.select(F.col("u").alias("file_id"), F.col("v").alias("cluster_id"))
            .unionByName(g.select(F.col("v").alias("file_id"),
                                  F.col("v").alias("cluster_id")))
            .dropDuplicates(["file_id"]))
