"""Text-analysis functions for training-data pipelines.

Everything here is a JVM-side Column expression (whole-stage codegen,
no Python), deliberately written with operations that have exact ANSI
SQL equivalents so each has a DuckDB oracle in ``__spark_entry__``:

* language-ID (marker-token heuristic),
* quality scoring (length / punctuation / stopword ratios),
* token counting (whitespace + a BPE-ish regex),
* document fingerprinting (md5-based; the rolling-hash shingle
  fingerprints live in functions/shingles.py),
* word n-gram sets for Jaccard similarity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: marker tokens per language — deterministic heuristic shared verbatim
#: with the SQL oracle (CASE WHEN chain; first match wins).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("de", [" der ", " und ", " nicht "]),
    ("fr", [" le ", " les ", " est "]),
    ("es", [" el ", " que ", " los "]),
    ("en", [" the ", " and ", " of "]),
]

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that"]

#: BPE-ish token pattern: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def lang_id(text: Column) -> Column:
    """Marker-based language guess; 'zh' for CJK, then marker chains,
    else 'unknown'. Mirrors the SQL oracle CASE chain exactly."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    expr = F.when(text.rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
    for lang, markers in LANG_MARKERS:
        cond = None
        for m in markers:
            c = padded.contains(m)
            cond = c if cond is None else (cond | c)
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    stripped = F.regexp_replace(text, "[.,;:!?]", "")
    return ((F.length(text) - F.length(stripped)).cast("double")
            / F.length(text).cast("double"))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    stops = F.filter(toks, lambda t: t.isin(EN_STOPWORDS))
    return F.size(stops).cast("double") / F.size(toks).cast("double")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (difPy has no text ops; this is the
    training-pipeline extension surface)."""
    return F.size(F.split(F.trim(text), "\\s+")).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / punct)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not too much
    punctuation, some stopwords (English-centric)."""
    len_term = F.least(F.length(text).cast("double") / F.lit(500.0),
                       F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3.0, 6)


def fingerprint(text: Column, n_hex: int = 16) -> Column:
    """Compact deterministic document fingerprint (md5 prefix).
    Shingle-level rolling-hash fingerprints: functions/shingles.py."""
    return F.substring(F.md5(text), 1, n_hex)


def word_ngrams(text: Column, n: int = 2) -> Column:
    """array<string> of distinct lowercase word n-grams."""
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)
                 ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx,
                        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.array_distinct(grams)
