"""Featurize: content -> MinHash / SimHash / anchor sketch (difPy O4).

Reference analogue: ``build._generate_tensor``
(`/root/reference/difPy/dif.py:229-248`) decodes an image and bicubic-
resizes it to a px_size^2 uint8 tensor — a fixed-size sketch whose
pairwise MSE approximates visual similarity. Our sketch for text/code is:

* char k-shingles of whitespace-normalized content, hashed to uint64 by a
  sliding polynomial hash + splitmix64 finalizer (deterministic, never
  Python ``hash()`` — PYTHONHASHSEED instability, SURVEY.md §4);
* **MinHash** over ``num_perm`` seeded affine permutations (estimated
  Jaccard replaces MSE, dif.py:697-717);
* **SimHash64** majority-bit fingerprint (cheap Hamming pre-filter);
* **anchor sketch** — the shingle hashes with ``h % anchor_mod == 0``
  (a uniform 1/mod sample of shingle space, smallest ``max_anchors``
  kept). Containment-safe by construction: A inside B implies
  shingles(A) subset shingles(B) implies anchors(A) subset anchors(B)
  — unlike a bottom-t MinHash sketch, which degenerates to globally
  common shingles on low-entropy corpora. Feeds the containment stage
  (the ``rotate`` analogue, dif.py:697-713).

All math is numpy over Arrow batches (pandas UDF) — no per-row Python in
the JVM<->Python crossing, per BASELINE.json ``input_hint``. The SAME
numpy kernel (`signature_of`) backs the pytest oracle, so Spark-vs-oracle
signature equality is exact, not approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from sparkdedup.config import DedupConfig

_U64 = np.uint64
_POLY_BASE = _U64(1099511628211)  # FNV prime as rolling base


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constant set)."""
    x = (x + _U64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def normalize_text(text: str) -> str:
    """Whitespace-collapse normalization applied before shingling only —
    sha256 stays over the RAW content (per-row invariant)."""
    return " ".join(text.split())


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique uint64 hashes of the char k-grams of normalized ``text``.

    Sliding-window polynomial hash over the utf-8 bytes, finalized with
    splitmix64. Texts shorter than k hash as one whole-string shingle so
    exact duplicates still co-bucket.
    """
    data = np.frombuffer(normalize_text(text).encode("utf-8"), dtype=np.uint8)
    m = len(data) - k + 1
    if m <= 0:
        if len(data) == 0:
            return np.array([], dtype=_U64)
        acc = _U64(0)
        for b in data.astype(_U64):
            acc = acc * _POLY_BASE + b
        return _splitmix64(np.array([acc], dtype=_U64))
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(_U64)
    with np.errstate(over="ignore"):
        powers = _POLY_BASE ** np.arange(k - 1, -1, -1, dtype=_U64)
        raw = (win * powers).sum(axis=1, dtype=_U64)
        return np.unique(_splitmix64(raw))


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded affine permutation params (a odd, b) — deterministic."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**64, size=num_perm, dtype=_U64) | _U64(1)
    b = rng.integers(0, 2**64, size=num_perm, dtype=_U64)
    return a, b


def signature_of(text: str, k: int, num_perm: int, seed: int,
                 anchor_mod: int = 32, max_anchors: int = 512,
                 params: tuple[np.ndarray, np.ndarray] | None = None,
                 ) -> tuple[np.ndarray, int, int, np.ndarray]:
    """(minhash int64[num_perm], simhash int64, n_shingles,
    anchors int64[<=max_anchors]).

    Pure numpy — shared verbatim by the Spark pandas UDF and tests/oracle.
    """
    a, b = params if params is not None else minhash_params(num_perm, seed)
    h = shingle_hashes(text, k)
    if h.size == 0:
        mh = np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        return mh, 0, 0, np.array([], dtype=np.int64)
    with np.errstate(over="ignore"):
        # (num_perm, m) affine transforms, cache-blocked: a full outer
        # product streams num_perm*m*8B (~1MB/doc) of temporaries
        # through DRAM and turns 32-core runs memory-bandwidth-bound;
        # 16-perm blocks keep the working set in L2 (identical results).
        mh_u = np.empty(num_perm, dtype=_U64)
        for s in range(0, num_perm, 16):
            e = min(s + 16, num_perm)
            mh_u[s:e] = (a[s:e, None] * h[None, :]
                         + b[s:e, None]).min(axis=1)
    mh = mh_u.view(np.int64)
    shifts = np.arange(64, dtype=_U64)
    # bit-count accumulation in shingle blocks for the same reason
    bits = np.zeros(64, dtype=np.int64)
    for s in range(0, h.size, 2048):
        blk = h[s:s + 2048]
        bits += ((blk[:, None] >> shifts[None, :]) & _U64(1)).sum(
            axis=0).astype(np.int64)
    sim_bits = (bits * 2 >= h.size).astype(np.uint64)
    simhash = int((sim_bits << shifts).sum(dtype=_U64).view(np.int64))
    anch = np.sort(h[h % _U64(anchor_mod) == 0])[:max_anchors]
    return mh, simhash, int(h.size), anch.view(np.int64)


#: MinHash travels as ONE binary column (num_perm little-endian uint64
#: lanes), not array<long>: the Arrow list<int64> + pandas object-column
#: conversion was ~3x the numpy kernel cost (round-1 bench); a bytes
#: buffer converts flat. JVM consumers slice it with substring()
#: (operators/lsh.py band keys, operators/verify.py lane agreement).
SIGNATURE_FIELDS = T.StructType([
    T.StructField("minhash", T.BinaryType(), False),
    T.StructField("simhash", T.LongType(), False),
    T.StructField("n_shingles", T.LongType(), False),
    T.StructField("anchors", T.ArrayType(T.LongType()), False),
])


def pack_minhash(mh: np.ndarray) -> bytes:
    """num_perm int64 lanes -> little-endian bytes (8 bytes per lane)."""
    return mh.astype("<i8", copy=False).tobytes()


def unpack_minhash(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i8")


def make_signature_udf(cfg: DedupConfig):
    """Arrow-vectorized pandas UDF: content -> signature struct.

    One Python worker invocation per Arrow batch (maxRecordsPerBatch
    rows); inner loop is numpy per document. This is the process
    boundary that replaces difPy's Pool.starmap (dif.py:189-213).
    """
    k, num_perm, seed = cfg.shingle_k, cfg.num_perm, cfg.seed
    anchor_mod, max_anchors = cfg.anchor_mod, cfg.max_anchors

    @pandas_udf(SIGNATURE_FIELDS)
    def signature(content: pd.Series) -> pd.DataFrame:
        params = minhash_params(num_perm, seed)
        mhs, sims, counts, anchors = [], [], [], []
        for text in content:
            mh, sh, n, anc = signature_of(text or "", k, num_perm, seed,
                                          anchor_mod, max_anchors, params)
            mhs.append(pack_minhash(mh))
            sims.append(sh)
            counts.append(n)
            anchors.append(anc)
        return pd.DataFrame({
            "minhash": mhs, "simhash": sims, "n_shingles": counts,
            "anchors": anchors,
        })

    return signature


def with_signature(df: DataFrame, cfg: DedupConfig,
                   col: str = "content") -> DataFrame:
    sig = make_signature_udf(cfg)
    return (df.withColumn("_sig", sig(F.col(col)))
              .withColumn("minhash", F.col("_sig.minhash"))
              .withColumn("simhash", F.col("_sig.simhash"))
              .withColumn("n_shingles", F.col("_sig.n_shingles"))
              .withColumn("anchors", F.col("_sig.anchors"))
              .drop("_sig"))
