"""Deterministic synthetic source-code corpus (FIXTURES.md T1).

Generates the ``input_hint`` schema ``(repo, path, commit, lang,
content)`` with planted structure — exact-duplicate groups, near-dup
mutations, contained files, chain groups, a skew cluster, singletons and
invalid rows — entirely from ``seed``; no external data.

Every row is a pure function of its row index, so generation runs
DISTRIBUTED via ``spark.range(n).mapInPandas`` — the driver never holds
the corpus. (difPy's input is a directory tree of images scanned at
`/root/reference/difPy/dif.py:96-149`; our input is this table.)

Region layout over row index ``i`` (fractions of ``n``):

    [exact 12%][near 12%][contained 6%][chain 6%][skew 8%][invalid 2%][singletons]

Exact-dup region uses blocks of 15 = groups of sizes (2, 3, 10)
(FIXTURES.md group sizes); near region blocks of 14 = (2, 3, 4, 5).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    # ground-truth companions (dropped by files_table(); kept for tests)
    T.StructField("gt_kind", T.StringType(), False),
    T.StructField("gt_group", T.LongType(), False),
    T.StructField("gt_member", T.IntegerType(), False),
])

_VOCAB = np.array([
    "count", "total", "index", "value", "buffer", "stream", "table", "row",
    "key", "node", "edge", "hash", "shard", "batch", "merge", "split",
    "flush", "parse", "token", "chunk", "offset", "cursor", "frame", "queue",
    "stack", "cache", "config", "result", "status", "error", "input",
    "output", "worker", "client", "server", "record", "field", "schema",
    "filter", "reduce",
])

_EXACT_SIZES = (2, 3, 10)
_NEAR_SIZES = (2, 3, 4, 5)
_LANGS = ("python", "java", "c", "go", "javascript")
_EXT = {"python": "py", "java": "java", "c": "c", "go": "go",
        "javascript": "js"}


def _regions(n: int) -> dict[str, tuple[int, int]]:
    """Half-open index ranges per planted-structure region."""
    bounds, start = {}, 0
    for name, frac in (("exact", 0.12), ("near", 0.12), ("contained", 0.06),
                       ("chain", 0.06), ("skew", 0.08), ("invalid", 0.02)):
        size = int(n * frac)
        bounds[name] = (start, start + size)
        start += size
    bounds["singleton"] = (start, n)
    return bounds


def _base_text(seed: int, group: int, n_lines: int = 24) -> list[str]:
    """Deterministic source-like text as a list of token-lines.

    Identifiers carry numeric suffixes (realistic entropy: a real code
    corpus has millions of distinct identifiers, not 40); without them
    every char shingle is globally common at scale and both LSH and the
    containment anchor index degrade to all-stopword buckets."""
    rng = np.random.RandomState((seed * 1_000_003 + group * 7919) % (2**31 - 1))
    words = rng.choice(_VOCAB, size=n_lines * 4)
    sufs = rng.randint(0, 9973, size=n_lines * 4)
    nums = rng.randint(0, 997, size=n_lines)
    lines = []
    for li in range(n_lines):
        w = words[li * 4:(li + 1) * 4]
        s = sufs[li * 4:(li + 1) * 4]
        lines.append(f"def {w[0]}{s[0]}_{w[1]}{s[1]}({w[2]}{s[2]}): "
                     f"return {w[3]}{s[3]} + {nums[li]}")
    return lines


def _mutate(lines: list[str], seed: int, group: int, member: int,
            frac: float) -> list[str]:
    """Replace ``frac`` of lines deterministically (near-dup edit budget)."""
    rng = np.random.RandomState(
        (seed * 31 + group * 1009 + member * 101 + 7) % (2**31 - 1))
    out = list(lines)
    k = max(1, int(len(lines) * frac))
    for idx in rng.choice(len(lines), size=k, replace=False):
        w = rng.choice(_VOCAB, size=4)
        s = rng.randint(0, 9973, size=4)
        out[idx] = (f"def {w[0]}{s[0]}_{w[1]}{s[1]}({w[2]}{s[2]}): "
                    f"return {w[3]}{s[3]} + {rng.randint(0, 997)}")
    return out


def _row(i: int, n: int, seed: int,
         regions: dict[str, tuple[int, int]]) -> tuple:
    for kind, (lo, hi) in regions.items():
        if lo <= i < hi:
            off = i - lo
            break
    else:  # pragma: no cover
        kind, off = "singleton", i

    if kind == "exact":
        block, pos = divmod(off, 15)
        if pos < 2:
            sub, member = 0, pos
        elif pos < 5:
            sub, member = 1, pos - 2
        else:
            sub, member = 2, pos - 5
        group = 1_000_000 + block * 3 + sub
        content = "\n".join(_base_text(seed, group))
    elif kind == "near":
        block, pos = divmod(off, 14)
        if pos < 2:
            sub, member = 0, pos
        elif pos < 5:
            sub, member = 1, pos - 2
        elif pos < 9:
            sub, member = 2, pos - 5
        else:
            sub, member = 3, pos - 9
        group = 2_000_000 + block * 4 + sub
        base = _base_text(seed, group)
        content = "\n".join(
            base if member == 0 else _mutate(base, seed, group, member, 0.06))
    elif kind == "contained":
        block, member = divmod(off, 2)
        group = 3_000_000 + block
        small = _base_text(seed, group, n_lines=12)
        if member == 0:
            content = "\n".join(small)
        else:
            pad = _base_text(seed, group + 500_000, n_lines=16)
            content = "\n".join(pad[:8] + small + pad[8:])
    elif kind == "chain":
        block, member = divmod(off, 3)
        group = 4_000_000 + block
        base = _base_text(seed, group)
        if member == 0:
            content = "\n".join(base)
        elif member == 1:
            content = "\n".join(_mutate(base, seed, group, 1, 0.22))
        else:  # C = B further mutated; A~B, B~C, A !~ C
            b = _mutate(base, seed, group, 1, 0.22)
            content = "\n".join(_mutate(b, seed, group, 2, 0.22))
    elif kind == "skew":
        group, member = 5_000_000, off
        content = "\n".join(_base_text(seed, group, n_lines=10))
    elif kind == "invalid":
        group, member = 6_000_000 + off, 0
        sub = off % 3
        if sub == 0:
            content = None
        elif sub == 1:
            content = ""
        else:  # disallowed extension / unknown lang
            content = "\x00binarydata" + str(off)
        lang = "binary" if sub == 2 else "python"
        ext = "bin" if sub == 2 else "py"
        repo = f"repo_{(group * 17 + member) % 20:03d}"
        return (repo, f"src/f_{i}.{ext}",
                hashlib.sha1(f"{seed}:{i}".encode()).hexdigest(), lang,
                content, kind, group, member)
    else:  # singleton
        group, member = 7_000_000 + off, 0
        content = "\n".join(_base_text(seed, group))

    lang = _LANGS[group % len(_LANGS)]
    repo = f"repo_{(group * 17 + member) % 20:03d}"
    path = f"src/{kind}/f_{group}_{member}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
    return (repo, path, commit, lang, content, kind, group, member)


def corpus_df(spark: SparkSession, n: int = 5000, seed: int = 42,
              partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus with ground-truth columns."""
    regions = _regions(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_row(int(i), n, seed, regions) for i in b["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in CORPUS_SCHEMA])

    rng = spark.range(n, numPartitions=partitions or 32)
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)


def files_table(spark: SparkSession, n: int = 5000, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """The input_hint table: (repo, path, commit, lang, content)."""
    return corpus_df(spark, n, seed, partitions).select(
        "repo", "path", "commit", "lang", "content")


def documents_as_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shim: map the driver's ``documents`` parquet
    (doc_id, text, lang, source, n_chars) onto the input_hint schema
    (FIXTURES.md T3): source→repo, text→content, constant commit."""
    from pyspark.sql import functions as F
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("source").alias("repo"),
            F.concat(F.lit("docs/"), F.col("doc_id").cast("string"),
                     F.lit(".txt")).alias("path"),
            F.lit("0" * 40).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    )
