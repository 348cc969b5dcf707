"""Similarity-search operators: exact vs vectorized top-k, SRP recall,
embedding near-dup edges, multimodal plumbing, text functions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkdedup.functions.multimodal import documents_as_media, media_features
from sparkdedup.functions.text import lang_id, quality_score, word_ngrams, ws_token_count
from sparkdedup.operators.similarity import (cosine_topk,
                                             cosine_topk_vectorized,
                                             embedding_neardup_edges,
                                             lsh_cosine_topk)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [(i, base[i].tolist(), i % 3) for i in range(40)]
    # plant near-duplicates: vec 50/51 are tiny perturbations of 0/1
    for i, src in ((50, 0), (51, 1)):
        v = base[src] + rng.standard_normal(16).astype(np.float32) * 0.01
        rows.append((i, v.tolist(), 0))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int").persist()


def test_vectorized_matches_exact_hof(emb, spark):
    q = emb.filter(F.col("vec_id") < 5)
    a = cosine_topk(emb, q, k=4).toPandas()
    b = cosine_topk_vectorized(emb, q, k=4).toPandas()
    key = ["query_id", "rank"]
    a, b = a.sort_values(key).reset_index(drop=True), \
        b.sort_values(key).reset_index(drop=True)
    assert (a["neighbor_id"] == b["neighbor_id"]).all()
    assert np.allclose(a["cos"], b["cos"], atol=1e-6)


def test_topk_finds_planted_neighbor(emb):
    got = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=1).collect()
    assert got[0]["neighbor_id"] == 50
    assert got[0]["cos"] > 0.99


def test_srp_topk_recall(emb):
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in cosine_topk(emb, emb.filter(F.col("vec_id") < 5),
                                  k=1).collect()}
    approx = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 5),
                                       dim=16, k=1, n_bits=4,
                                       n_tables=8).collect()}
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits >= 4  # 8 tables x 4 bits: near-certain for top-1


def test_embedding_neardup_finds_planted(emb):
    edges = embedding_neardup_edges(emb, dim=16, threshold=0.95, n_bits=4,
                                    n_tables=8).collect()
    pairs = {(r["src"], r["dst"]) for r in edges}
    assert (0, 50) in pairs and (1, 51) in pairs


def test_media_features_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "text one", "en", "s", 8), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    feats = media_features(documents_as_media(docs), dim=8).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["error"] is None and len(by_id[1]["feature"]) == 8
    assert by_id[2]["error"] == "Invalid or corrupted file"
    # deterministic fake decode
    feats2 = media_features(documents_as_media(docs), dim=8).collect()
    assert {r["media_id"]: r["feature"] for r in feats2}[1] == \
        by_id[1]["feature"]


def test_media_real_decoder_is_stubbed(spark):
    docs = spark.createDataFrame(
        [(1, "payload", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long")
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        media_features(documents_as_media(docs), dim=8, fake=False).collect()


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("the cat and the dog sat on the mat",),
         ("der hund und die katze sind nicht da",),
         ("一个中文句子",)], "text string")
    rows = df.select(
        lang_id(F.col("text")).alias("lang"),
        ws_token_count(F.col("text")).alias("toks"),
        quality_score(F.col("text")).alias("q"),
        F.size(word_ngrams(F.col("text"), 2)).alias("bigrams"),
    ).collect()
    assert [r["lang"] for r in rows] == ["en", "de", "zh"]
    assert rows[0]["toks"] == 9
    assert rows[0]["bigrams"] == 8  # 9 tokens -> 8 distinct bigrams
    assert 0.0 <= rows[0]["q"] <= 1.0


def test_word_ngrams_short_input(spark):
    df = spark.createDataFrame([("one",), ("",)], "text string")
    rows = df.select(F.size(word_ngrams(F.col("text"), 2)).alias("n")).collect()
    assert rows[0]["n"] == 0
