"""End-to-end engine-vs-oracle parity (BASELINE.json correctness gate).

Brute-force difPy-semantics oracle (tests/oracle.py) vs the distributed
pipeline on the planted corpus, at IDENTICAL shingle/num_perm/band/seed
config: dup-pair closure recall >= 0.99, greedy-group containment in CC
clusters, sha256 per-row invariance, representative-ranking parity.
"""

from __future__ import annotations

import hashlib

import pytest

from sparkdedup.config import DedupConfig
from sparkdedup.corpus import corpus_df, files_table
from sparkdedup.plans.pipeline import run

from .oracle import pair_closure_recall, run_oracle

N = 900
SEED = 42


@pytest.fixture(scope="module")
def engine_and_oracle(spark):
    cfg = DedupConfig(similarity="similar", containment=False)
    files = files_table(spark, n=N, seed=SEED)
    res = run(spark, cfg, files)
    rows = [
        {"id": r["file_id"], "content": r["content"],
         "n_chars": r["n_chars"], "path": r["path"]}
        for r in run_input_rows(spark, cfg, files)
    ]
    oracle = run_oracle(rows, cfg)
    cluster_of = {r["file_id"]: r["cluster_id"]
                  for r in res.clusters.collect()}
    return res, oracle, cluster_of, rows


def run_input_rows(spark, cfg, files):
    from sparkdedup.plans.pipeline import build_signatures
    sigs, _ = build_signatures(spark, cfg, files)
    return sigs.select("file_id", "content", "n_chars", "path").collect()


def test_dup_pair_recall_ge_099(engine_and_oracle):
    _, oracle, cluster_of, _ = engine_and_oracle
    recall, hit, total = pair_closure_recall(oracle, cluster_of)
    assert total > 50  # the corpus actually planted pairs
    assert recall >= 0.99, f"recall {recall:.4f} ({hit}/{total})"


def test_engine_pairs_are_sound(engine_and_oracle):
    """Precision: every near edge the engine emits is a true oracle pair
    (distances computed identically => no false positives)."""
    res, oracle, _, _ = engine_and_oracle
    near = {(min(r["src"], r["dst"]), max(r["src"], r["dst"])): r["dist"]
            for r in res.edges.filter("kind = 'near'").collect()}
    for pair, dist in near.items():
        assert pair in oracle.near_pairs, f"false positive {pair}"
        assert abs(oracle.near_pairs[pair] - dist) < 1e-9


def test_greedy_groups_inside_cc_clusters(engine_and_oracle):
    """Each difPy greedy-star group is a subset of one engine component
    (CC is the transitive closure of the greedy grouping)."""
    _, oracle, cluster_of, _ = engine_and_oracle
    for g in oracle.groups:
        cids = {cluster_of.get(m) for m in g}
        assert len(cids) == 1 and None not in cids, f"group split: {g}"


def test_sha256_per_row_invariant(spark, engine_and_oracle):
    """input_hint: engine sha256 equals reference sha256 per row."""
    cfg = DedupConfig(similarity="similar")
    from sparkdedup.plans.pipeline import build_signatures
    sigs, _ = build_signatures(spark, cfg, files_table(spark, n=200, seed=7))
    for r in sigs.select("content", "sha256").collect():
        assert r["sha256"] == hashlib.sha256(
            r["content"].encode("utf-8")).hexdigest()


def test_lower_quality_parity(engine_and_oracle):
    """Engine lower_quality (window rank) covers every oracle group's
    non-best members, modulo grouping topology: the engine's cluster is
    the closure, so its representative is at least as good (max n_chars,
    path asc) as the oracle group's."""
    res, oracle, cluster_of, rows = engine_and_oracle
    meta = {r["id"]: r for r in rows}
    keep = {r["file_id"] for r in res.ranked.filter("is_keep").collect()}
    for g in oracle.groups:
        ranked = sorted(g, key=lambda i: (-meta[i]["n_chars"],
                                          meta[i]["path"], i))
        best = ranked[0]
        cluster_best = [m for m in g if m in keep]
        # engine keeps at most one member of this group...
        assert len(cluster_best) <= 1
        # ...and if it kept one, it is at least as good as the oracle best
        if cluster_best:
            m = cluster_best[0]
            assert (-meta[m]["n_chars"], meta[m]["path"]) <= (
                -meta[best]["n_chars"], meta[best]["path"])


def test_invalid_rows_never_in_results(spark, engine_and_oracle):
    res, *_ = engine_and_oracle
    gt = corpus_df(spark, n=N, seed=SEED)
    invalid_paths = {r["path"]
                     for r in gt.filter("gt_kind = 'invalid'").collect()}
    assert invalid_paths
    got_invalid = {r["path"] for r in res.invalid.collect()}
    assert invalid_paths <= got_invalid
    ranked_paths = {r["path"] for r in res.ranked.collect()}
    assert not (invalid_paths & ranked_paths)


def test_every_file_in_at_most_one_cluster(engine_and_oracle):
    res, *_ = engine_and_oracle
    ids = [r["file_id"] for r in res.clusters.collect()]
    assert len(ids) == len(set(ids))


def test_cluster_id_is_min_member(engine_and_oracle):
    res, *_ = engine_and_oracle
    rows = res.clusters.groupBy("cluster_id").min("file_id").collect()
    for r in rows:
        assert r["cluster_id"] == r["min(file_id)"]
