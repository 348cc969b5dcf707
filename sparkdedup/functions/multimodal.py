"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-pipeline extension: image/audio/video payloads are carried as
``binary`` columns with a typed metadata struct; decode / feature-
extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The image/audio codecs are NOT present in this environment, so
the decode kernels are STUBBED — ``decode_media`` raises
``NotImplementedError`` unless ``fake=True`` selects the deterministic
fake decoder — but the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested.

This is also the honest home of difPy's actual domain: its decode stage
(`/root/reference/difPy/dif.py:229-248`, PIL open -> RGB -> bicubic
resize to px_size^2) maps to ``decode_media`` + ``media_features``; the
rest of the engine (LSH, CC, ranking) is media-agnostic once features
exist.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("error", T.StringType(), True),
    # provenance checksum of the payload the DECODER actually received,
    # computed inside the task (null on error rows). At 100 TB this is
    # the integrity/dedup key for feature rows; at correctness scale it
    # lets an external oracle prove byte-exact payload transit through
    # the binary column + Arrow batches (sha256(payload) is computable
    # on the source side by any SQL engine).
    T.StructField("payload_sha", T.StringType(), True),
])


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': payload bytes -> unit vector.
    Stands in for PIL-open+resize (dif.py:236-241) where codecs are
    unavailable; real deployments swap in the actual decoder here."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    vec = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return vec / np.linalg.norm(vec)


def _pil_decode(payload: bytes, px_size: int) -> np.ndarray:
    """REAL image decode — the reference's exact recipe
    (dif.py:229-248): open -> RGB -> bicubic resize to px_size^2 ->
    uint8 tensor, flattened to float32 in [0, 1]. Importable only where
    Pillow exists (not this sandbox); the seam and its error contract
    are exercised by tests gated on ``pytest.importorskip('PIL')``."""
    import io

    from PIL import Image  # optional dependency: the decoder seam

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    img = img.resize((px_size, px_size), resample=Image.BICUBIC)
    arr = np.asarray(img, dtype=np.uint8)
    return (arr.astype(np.float32) / 255.0).reshape(-1)


def media_features(media: DataFrame, dim: int = 32,
                   fake: bool = True, px_size: int = 8) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    ``fake=True`` uses the deterministic fake decoder (payload-hash unit
    vector of ``dim``). ``fake=False`` is the REAL decoder seam: PIL
    open -> RGB -> bicubic ``px_size``^2 resize, the reference's own
    recipe — it imports Pillow inside the task and raises
    ``NotImplementedError`` where Pillow is absent (this sandbox), so
    the stub is impossible to mistake for a decoder. Per-row decode
    FAILURES (null/corrupt payload) go to the ``error`` column, the
    invalid-file side-output pattern (dif.py:243-248).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                import PIL  # noqa: F401  (probe once per task, not per row)
            except ImportError as exc:
                raise NotImplementedError(
                    "real media decoding requires Pillow; not available "
                    "in this environment") from exc
        for b in batches:
            rows = {"media_id": [], "kind": [], "feature": [], "error": [],
                    "payload_sha": []}
            for mid, kind, payload in zip(b["media_id"], b["kind"],
                                          b["payload"]):
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                if payload is None or len(payload) == 0:
                    rows["feature"].append(None)
                    rows["error"].append("Invalid or corrupted file")
                    rows["payload_sha"].append(None)
                    continue
                try:
                    if fake:
                        feat = _fake_decode(bytes(payload), dim)
                    else:
                        feat = _pil_decode(bytes(payload), px_size)
                except NotImplementedError:
                    raise
                except Exception:
                    # undecodable payload -> side output, job survives
                    rows["feature"].append(None)
                    rows["error"].append("Invalid or corrupted file")
                    rows["payload_sha"].append(None)
                    continue
                rows["feature"].append(feat)
                rows["error"].append(None)
                rows["payload_sha"].append(
                    hashlib.sha256(bytes(payload)).hexdigest())
            yield pd.DataFrame(rows)

    return (media.select("media_id", "kind", "payload")
            .repartition("media_id")
            .mapInPandas(extract, schema=FEATURE_SCHEMA))


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for testing the plumbing on text tables: text bytes as an
    opaque payload (binary cast), metadata defaulted."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
