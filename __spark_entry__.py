"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup pipeline at sf0.001.
``queries()`` exposes one entry per implemented operator (SURVEY.md §2 +
training-pipeline extensions); ``oracle_sql()`` gives the DuckDB-
equivalent SQL for every SQL-expressible one (same column names/aliases
on both sides; per-row scalar expressions use identical operation order
so doubles match bit-for-bit before round()).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.corpus import documents_as_files
from sparkdedup.functions import text as TX
from sparkdedup.functions.multimodal import documents_as_media, media_features
from sparkdedup.functions.shingles import with_signature
from sparkdedup.operators.lsh import candidate_pairs, dedup_pairs
from sparkdedup.operators.similarity import (cosine_topk,
                                             embedding_neardup_edges,
                                             lsh_cosine_topk)
from sparkdedup.plans.pipeline import run as run_pipeline

ALLOWED = ["en", "de", "fr", "es", "zh"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup pipeline (exact + LSH near + containment)
    over the sf0.001 documents table; returns ranked cluster members."""
    cfg = DedupConfig(similarity="similar", containment=True)
    files = documents_as_files(spark, "/root/testdata/sf0.001")
    res = run_pipeline(spark, cfg, files)
    return res.ranked


# --------------------------------------------------------------------
# SQL-checked queries (DuckDB oracle on the same parquet)
# --------------------------------------------------------------------

def q_exact_dup_groups(spark, sf):
    # O9: exact-duplicate groups via content hash
    return (_docs(spark, sf)
            .groupBy(F.md5("text").alias("content_hash"))
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min("doc_id").alias("rep_doc_id"))
            .filter(F.col("n_copies") > 1))


def q_dup_star_edges_bucket(spark, sf):
    # O9/O14 star-edge pattern, keyed by (lang, len_bucket) so the
    # result is non-empty on dup-free corpora
    d = _docs(spark, sf).withColumn(
        "len_bucket", (F.length(F.bin(F.col("n_chars"))) - 1).cast("long"))
    w = Window.partitionBy("lang", "len_bucket")
    return (d
            .withColumn("src", F.min("doc_id").over(w))
            .withColumn("grp_n", F.count(F.lit(1)).over(w))
            .filter((F.col("grp_n") > 1) & (F.col("doc_id") != F.col("src")))
            .select("lang", "len_bucket", "src",
                    F.col("doc_id").alias("dst")))


def q_representatives(spark, sf):
    # O16: top-1 per group (max n_chars, doc_id asc tiebreak)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                             F.asc("doc_id"))
    return (_docs(spark, sf).withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("source", "doc_id", "n_chars"))


def q_lower_quality(spark, sf):
    # O16: every non-best member per group
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                             F.asc("doc_id"))
    return (_docs(spark, sf).withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > 1)
            .select("source", "doc_id", F.col("rn").cast("int").alias("rn")))


def q_lang_filter_counts(spark, sf):
    # O3: allowlist filter + counting aggregation (O17)
    return (_docs(spark, sf)
            .filter(F.col("lang").isin(ALLOWED) & (F.col("n_chars") > 0))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


def q_len_histogram(spark, sf):
    # same_dim analogue: log2 length-bucket histogram (O8)
    return (_docs(spark, sf)
            .withColumn("len_bucket",
                        (F.length(F.bin(F.col("n_chars"))) - 1).cast("long"))
            .groupBy("len_bucket")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def q_token_counts(spark, sf):
    return (_docs(spark, sf).filter(F.col("doc_id") < 100)
            .select("doc_id", TX.ws_token_count(F.col("text"))
                    .alias("n_tokens")))


def q_bpe_token_counts(spark, sf):
    return (_docs(spark, sf)
            .filter((F.col("doc_id") < 100) & (F.col("lang") == "en"))
            .select("doc_id",
                    TX.bpe_token_count(F.col("text")).alias("n_bpe")))


def q_quality_scores(spark, sf):
    return (_docs(spark, sf).filter(F.col("doc_id") < 200)
            .select("doc_id",
                    TX.quality_score(F.col("text")).alias("quality")))


def q_lang_id_counts(spark, sf):
    return (_docs(spark, sf)
            .select(TX.lang_id(F.col("text")).alias("pred_lang"))
            .groupBy("pred_lang")
            .agg(F.count(F.lit(1)).alias("n")))


def q_fingerprints(spark, sf):
    return (_docs(spark, sf).filter(F.col("doc_id") < 100)
            .select("doc_id", TX.fingerprint(F.col("text")).alias("fp")))


def q_ngram_jaccard_adjacent(spark, sf):
    d = _docs(spark, sf).select("doc_id",
                                TX.word_ngrams(F.col("text"), 2).alias("g"))
    a = d.filter(F.col("doc_id") < 50).alias("a")
    b = d.alias("b")
    joined = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    inter = F.size(F.array_intersect("a.g", "b.g")).cast("double")
    union = F.size(F.array_union("a.g", "b.g")).cast("double")
    return (joined
            .filter(union > 0)
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.round(inter / union, 6).alias("jaccard")))


def q_cosine_topk(spark, sf):
    e = _emb(spark, sf)
    return cosine_topk(e, e.filter(F.col("vec_id") < 5), k=3)


# --------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: MinHash/LSH/CC/suffix-array)
# --------------------------------------------------------------------

def _doc_sigs(spark, sf, cfg):
    from sparkdedup.plans.pipeline import build_signatures
    return build_signatures(spark, cfg, documents_as_files(spark, sf))[0]


def q_minhash_signatures(spark, sf):
    cfg = DedupConfig(similarity="similar")
    s = _doc_sigs(spark, sf, cfg)
    return s.select("file_id", "sha256", "simhash", "n_shingles",
                    F.element_at("minhash", 1).alias("minhash_lane0"))


def q_lsh_candidate_pairs(spark, sf):
    cfg = DedupConfig(similarity="similar")
    s = _doc_sigs(spark, sf, cfg)
    return dedup_pairs(candidate_pairs(s, cfg)).select("src", "dst", "gen")


def q_near_dup_clusters(spark, sf):
    cfg = DedupConfig(similarity="similar")
    res = run_pipeline(spark, cfg, documents_as_files(spark, sf))
    return res.clusters


def q_containment_edges(spark, sf):
    from sparkdedup.operators.containment import containment_edges
    cfg = DedupConfig(containment=True)
    s = _doc_sigs(spark, sf, cfg)
    return containment_edges(s, cfg)


def q_srp_topk(spark, sf):
    e = _emb(spark, sf)
    return lsh_cosine_topk(e, e.filter(F.col("vec_id") < 5), dim=64, k=3,
                           n_bits=8, n_tables=4)


def q_embedding_neardup(spark, sf):
    return embedding_neardup_edges(_emb(spark, sf), dim=64, threshold=0.2,
                                   n_bits=6, n_tables=8)


def q_media_features(spark, sf):
    feats = media_features(documents_as_media(_docs(spark, sf)), dim=16)
    return feats.select("media_id", "kind", "error",
                        F.round(F.element_at("feature", 1), 6)
                        .alias("feat0"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dup_groups": q_exact_dup_groups,
        "dup_star_edges_bucket": q_dup_star_edges_bucket,
        "representatives": q_representatives,
        "lower_quality": q_lower_quality,
        "lang_filter_counts": q_lang_filter_counts,
        "len_histogram": q_len_histogram,
        "token_counts": q_token_counts,
        "bpe_token_counts": q_bpe_token_counts,
        "quality_scores": q_quality_scores,
        "lang_id_counts": q_lang_id_counts,
        "fingerprints": q_fingerprints,
        "ngram_jaccard_adjacent": q_ngram_jaccard_adjacent,
        "cosine_topk": q_cosine_topk,
        # rows-only
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidate_pairs": q_lsh_candidate_pairs,
        "near_dup_clusters": q_near_dup_clusters,
        "containment_edges": q_containment_edges,
        "srp_topk": q_srp_topk,
        "embedding_neardup": q_embedding_neardup,
        "media_features": q_media_features,
    }


_DOT = ("list_reduce(list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)")


def oracle_sql() -> dict[str, str]:
    in_list = ", ".join(f"'{x}'" for x in ALLOWED)
    stop_list = ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS)
    markers = "WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'"
    for lang, ms in TX.LANG_MARKERS:
        cond = " OR ".join(
            f"contains(' ' || lower(text) || ' ', '{m}')" for m in ms)
        markers += f" WHEN {cond} THEN '{lang}'"
    dot_qc = _DOT.format(a="q.embedding", b="c.embedding")
    dot_qq = _DOT.format(a="q.embedding", b="q.embedding")
    dot_cc = _DOT.format(a="c.embedding", b="c.embedding")
    return {
        "exact_dup_groups": """
            SELECT md5(text) AS content_hash, count(*) AS n_copies,
                   min(doc_id) AS rep_doc_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dup_star_edges_bucket": """
            WITH d AS (
              SELECT lang, CAST(length(bin(n_chars)) - 1 AS BIGINT)
                       AS len_bucket, doc_id,
                     min(doc_id) OVER (PARTITION BY lang,
                       length(bin(n_chars)) - 1) AS src,
                     count(*) OVER (PARTITION BY lang,
                       length(bin(n_chars)) - 1) AS grp_n
              FROM documents)
            SELECT lang, len_bucket, src, doc_id AS dst
            FROM d WHERE grp_n > 1 AND doc_id <> src
        """,
        "representatives": """
            SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents) WHERE rn = 1
        """,
        "lower_quality": """
            SELECT source, doc_id, CAST(rn AS INT) AS rn FROM (
              SELECT source, doc_id,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents) WHERE rn > 1
        """,
        "lang_filter_counts": f"""
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents WHERE lang IN ({in_list}) AND n_chars > 0
            GROUP BY lang
        """,
        "len_histogram": """
            SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS len_bucket,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "token_counts": """
            SELECT doc_id, CAST(len(regexp_split_to_array(trim(text),
                   '\\s+')) AS BIGINT) AS n_tokens
            FROM documents WHERE doc_id < 100
        """,
        "bpe_token_counts": f"""
            SELECT doc_id, CAST(len(regexp_extract_all(text,
                   '{TX.BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe
            FROM documents WHERE doc_id < 100 AND lang = 'en'
        """,
        "quality_scores": f"""
            WITH q AS (
              SELECT doc_id,
                least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_term,
                1.0 - least(
                  CAST(length(text) - length(regexp_replace(text,
                    '[.,;:!?]', '', 'g')) AS DOUBLE)
                  / CAST(length(text) AS DOUBLE) * 5.0, 1.0) AS punct_term,
                least(CAST(len(list_filter(
                    regexp_split_to_array(trim(lower(text)), '\\s+'),
                    t -> list_contains([{stop_list}], t))) AS DOUBLE)
                  / CAST(len(regexp_split_to_array(trim(lower(text)),
                    '\\s+')) AS DOUBLE) * 4.0, 1.0) AS stop_term
              FROM documents WHERE doc_id < 200)
            SELECT doc_id, round((len_term + punct_term + stop_term) / 3.0,
                   6) AS quality FROM q
        """,
        "lang_id_counts": f"""
            SELECT CASE {markers} ELSE 'unknown' END AS pred_lang,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "fingerprints": """
            SELECT doc_id, substr(md5(text), 1, 16) AS fp
            FROM documents WHERE doc_id < 100
        """,
        "ngram_jaccard_adjacent": """
            WITH g AS (
              SELECT doc_id, list_distinct(list_transform(
                generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS grams
              FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)),
                    '\\s+') AS t FROM documents))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect(a.grams, b.grams))
                     AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(a.grams, b.grams)))
                     AS DOUBLE), 6) AS jaccard
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id < 50
              AND len(list_distinct(list_concat(a.grams, b.grams))) > 0
        """,
        "cosine_topk": f"""
            WITH scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     {dot_qc} / (sqrt({dot_qq}) * sqrt({dot_cc})) AS cos_raw
              FROM embeddings q JOIN embeddings c
                ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_raw DESC, neighbor_id ASC) AS rank,
                     cos_raw
              FROM scored)
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
                   round(cos_raw, 6) AS cos
            FROM ranked WHERE rank <= 3
        """,
    }
