"""Deterministic corpus generator (FIXTURES.md T1): structure,
determinism, distribution across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdedup.corpus import corpus_df, documents_as_files, files_table
from sparkdedup.functions.shingles import normalize_text


def test_deterministic_across_partitionings(spark):
    a = corpus_df(spark, n=300, seed=42, partitions=4).orderBy("path")
    b = corpus_df(spark, n=300, seed=42, partitions=17).orderBy("path")
    assert [r.asDict() for r in a.collect()] == \
        [r.asDict() for r in b.collect()]


def test_seed_changes_content(spark):
    a = corpus_df(spark, n=50, seed=1).select("content").collect()
    b = corpus_df(spark, n=50, seed=2).select("content").collect()
    assert a != b


def test_planted_structure(spark):
    gt = corpus_df(spark, n=1000, seed=42).persist()
    kinds = {r["gt_kind"]: r["count"]
             for r in gt.groupBy("gt_kind").count().collect()}
    assert set(kinds) == {"exact", "near", "contained", "chain", "skew",
                          "invalid", "singleton"}
    # exact groups share content verbatim
    exact = gt.filter("gt_kind = 'exact'")
    grp = exact.groupBy("gt_group").agg(
        F.countDistinct("content").alias("d"),
        F.count(F.lit(1)).alias("n")).collect()
    full = [g for g in grp if g["n"] in (2, 3, 10)]
    assert full and all(g["d"] == 1 for g in full)
    # contained pairs: member 0 normalized-contained in member 1
    cont = gt.filter("gt_kind = 'contained'").collect()
    by_group: dict = {}
    for r in cont:
        by_group.setdefault(r["gt_group"], {})[r["gt_member"]] = r["content"]
    checked = 0
    for members in by_group.values():
        if 0 in members and 1 in members:
            assert normalize_text(members[0]) in normalize_text(members[1])
            checked += 1
    assert checked > 0
    # skew: one content duplicated many times
    skew = gt.filter("gt_kind = 'skew'")
    assert skew.select("content").distinct().count() == 1
    assert skew.count() > 50
    # invalid rows: null/empty/NUL
    inv = gt.filter("gt_kind = 'invalid'").collect()
    assert any(r["content"] is None for r in inv)
    assert any(r["content"] == "" for r in inv)
    assert any(r["content"] and "\x00" in r["content"] for r in inv)


def test_files_table_drops_gt_columns(spark):
    cols = files_table(spark, n=20, seed=42).columns
    assert cols == ["repo", "path", "commit", "lang", "content"]


def test_documents_shim_schema(spark):
    df = documents_as_files(spark, "/root/testdata/sf0.001")
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() > 0
