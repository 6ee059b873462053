"""Text analysis operators over a documents table — all JVM-side column
expressions except the winnowing fingerprint (vectorized pandas_udf).

 * token/char counts (whitespace + a BPE-ish word/punct regex),
 * quality scores (distinct-token ratio, stopword ratio, punctuation ratio),
 * n-gram-overlap language ID against per-language stopword profiles,
 * winnowing document fingerprint (rolling polynomial hash + window min).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from owl2jsonschema_js_spark.operators.dedup import tokens_col, ws_strip

# tiny per-language stopword profiles for the n-gram-overlap heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "y", "a", "en", "es", "un", "que", "no"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "ne", "pas"],
}

_BPE_ISH = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = ws_strip(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_count(text_col: str = "text") -> Column:
    """BPE-flavored proxy: word runs + individual punctuation marks."""
    return F.regexp_count(F.col(text_col), F.lit(_BPE_ISH))


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   stopwords: list[str] | None = None) -> DataFrame:
    """(id, n_tokens, distinct_ratio, stopword_ratio, punct_ratio) — the
    classic cheap quality signals for corpus filtering."""
    sw = F.array(*[F.lit(w) for w in (stopwords or LANG_PROFILES["en"])])
    toks = F.split(ws_strip(F.col(text_col)), r"\s+")
    n = F.size(toks).cast("double")
    uniq = F.array_distinct(toks)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.size(uniq) / n).alias("distinct_ratio"),
        (F.size(F.array_intersect(uniq, sw)).cast("double") / F.size(uniq)).alias("stopword_ratio"),
        (F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
         / F.greatest(F.length(text_col), F.lit(1))).alias("punct_ratio"),
    )


def _lang_best(toks: Column, profiles: dict[str, list[str]] | None = None) -> Column:
    """struct(score, inv, lang) of the argmax stopword-overlap language for a
    distinct-token array column; deterministic tie-break on language code
    (ascending) via array_max over (score, reversed-lang) structs."""
    profiles = profiles or LANG_PROFILES
    entries = []
    for lang in sorted(profiles, reverse=True):  # so array_max tie-break = asc lang
        sw = F.array(*[F.lit(w) for w in profiles[lang]])
        score = F.size(F.array_intersect(toks, sw))
        entries.append(F.struct(score.alias("score"),
                                F.lit("".join(chr(255 - ord(c)) for c in lang)).alias("inv"),
                                F.lit(lang).alias("lang")))
    return F.array_max(F.array(*entries))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            profiles: dict[str, list[str]] | None = None) -> DataFrame:
    """(id, lang_pred, lang_score): argmax stopword-overlap count across
    language profiles — pure column expressions."""
    best = _lang_best(tokens_col(text_col), profiles)
    return docs.select(F.col(id_col), best["lang"].alias("lang_pred"),
                       best["score"].alias("lang_score"))


def corpus_profile(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   stopwords: list[str] | None = None,
                   extra: dict[str, Column] | None = None) -> DataFrame:
    """Every cheap text signal of the training-data pipeline in ONE scan:
    token count, BPE-ish count, distinct/stopword/punctuation ratios, and
    language ID. All are column expressions over the same tokenization, so
    Catalyst fuses the whole profile into a single WholeStageCodegen pass
    over the pruned (id, text) scan — asserted in tests/test_plans.py.
    ``extra``: additional named Columns to evaluate in the SAME scan (used by
    quality_filter for the dup-line ratio — a join here would be a shuffle
    for nothing)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or LANG_PROFILES["en"])])
    toks = F.split(ws_strip(F.col(text_col)), r"\s+")
    uniq = F.array_distinct(toks)
    n = F.size(toks).cast("double")
    best = _lang_best(uniq)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        bpe_ish_count(text_col).alias("n_bpe_tokens"),
        (F.size(uniq) / n).alias("distinct_ratio"),
        (F.size(F.array_intersect(uniq, sw)).cast("double") / F.size(uniq)).alias("stopword_ratio"),
        (F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
         / F.greatest(F.length(text_col), F.lit(1))).alias("punct_ratio"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
        *[c.alias(name) for name, c in (extra or {}).items()],
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, window: int = 4,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprints array<long>): winnowing (Schleimer et al.) — rolling
    polynomial hash over char k-grams, min per sliding window, distinct.
    Vectorized numpy inside a pandas_udf (Arrow batches, no per-row Python)."""
    kk, ww = k, window

    @pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        # 31-bit Mersenne modulus keeps window@weights products inside int64
        # (256 * 2^31 * k << 2^63), so the whole k-gram hash is ONE windowed
        # matmul per document — no per-character Python.
        B, M = np.int64(131), np.int64((1 << 31) - 1)
        weights = np.empty(kk, dtype=np.int64)
        w = np.int64(1)
        for j in range(kk - 1, -1, -1):  # k iterations, k~8
            weights[j] = w
            w = (w * B) % M
        out = []
        for t in texts.fillna(""):
            b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.int64)
            if b.size < kk:
                out.append([])
                continue
            h = (np.lib.stride_tricks.sliding_window_view(b, kk) @ weights) % M
            if h.size >= ww:
                mins = np.lib.stride_tricks.sliding_window_view(h, ww).min(axis=1)
            else:
                mins = np.array([h.min()])
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return docs.select(F.col(id_col), fp(F.col(text_col)).alias("fingerprints"))


# Gopher-style default bounds for quality_filter — each rule is
# (rule_id, column, lo, hi); None = unbounded on that side. Values follow the
# published corpus-filtering heuristics (Rae et al. 2021 "Gopher" §A1.1 /
# C4's line-level rules), adapted to the signals corpus_profile computes.
DEFAULT_QUALITY_RULES: list[tuple[str, str, float | None, float | None]] = [
    ("tokens",        "n_tokens",        50,    100_000),
    ("distinct",      "distinct_ratio",  0.20,  None),     # repetition guard
    ("stopword",      "stopword_ratio",  0.01,  None),     # gibberish guard
    ("punct",         "punct_ratio",     None,  0.20),     # markup/code guard
    ("repeated_line", "dup_line_ratio",  None,  0.30),     # boilerplate guard
]


def dup_line_ratio(text_col: str = "text") -> Column:
    """Fraction of duplicate lines within the document (C4's repeated-line
    heuristic): 1 - distinct_lines/lines. Single-line docs score 0."""
    lines = F.split(F.col(text_col), r"\n")
    n = F.size(lines).cast("double")
    return (F.lit(1.0) - F.size(F.array_distinct(lines)) / n)


def quality_filter(docs: DataFrame, rules=None, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Corpus quality-filter chain: every signal + per-rule pass flags + the
    keep verdict + the first failed rule, in ONE codegen scan.

    This is the standard shape between crawling and training: compute cheap
    signals (corpus_profile + dup-line ratio), apply threshold rules, keep
    the survivors — but emit per-rule attribution rather than a bare boolean,
    because at corpus scale the *rejection histogram* (groupBy first_failed)
    is the observability a pipeline needs to tune thresholds. Rules are
    (rule_id, column, lo, hi) tuples over the profile columns; rows failing
    rule k still evaluate rule k+1 (flags are independent), mirroring how the
    validation engine reports every violated constraint, not just the first.

    Output: profile columns + ok_<rule> booleans + keep + first_failed
    (null when kept). All JVM expressions — filter chains must never be the
    Python-UDF part of a pipeline."""
    rules = DEFAULT_QUALITY_RULES if rules is None else rules
    prof = corpus_profile(docs, id_col, text_col,
                          extra={"dup_line_ratio": dup_line_ratio(text_col)})
    flags = {}
    for rid, col, lo, hi in rules:
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (F.col(col) >= F.lit(lo))
        if hi is not None:
            ok = ok & (F.col(col) <= F.lit(hi))
        flags[f"ok_{rid}"] = F.coalesce(ok, F.lit(False))
    out = prof.withColumns(flags)
    keep = F.lit(True)
    for rid, *_ in rules:
        keep = keep & F.col(f"ok_{rid}")
    first_failed = F.coalesce(
        *[F.when(~F.col(f"ok_{rid}"), F.lit(rid)) for rid, *_ in rules],
        F.lit(None).cast("string"))
    return out.withColumn("keep", keep).withColumn("first_failed", first_failed)


def calibrated_quality_rules(docs: DataFrame,
                             pct_lo: float = 0.05, pct_hi: float = 0.95,
                             signals: tuple[str, ...] = (
                                 "n_tokens", "distinct_ratio",
                                 "stopword_ratio", "punct_ratio",
                                 "dup_line_ratio"),
                             id_col: str = "doc_id", text_col: str = "text",
                             exact: bool = True) -> list[tuple]:
    """Percentile-calibrated threshold rules for :func:`quality_filter`:
    keep the [pct_lo, pct_hi] band of each signal AS MEASURED ON THIS
    CORPUS, instead of hand-ported literature constants — the per-domain
    tuning step every real pipeline runs (fiction vs code vs transcripts
    have wildly different punctuation/stopword baselines).

    One aggregate over the fused profile scan; output is O(signals) driver
    tuples. ``exact=True`` uses Spark's exact ``percentile`` (the same
    linear interpolation as SQL ``quantile_cont`` — oracle-tested); at
    10^12 rows pass ``exact=False`` for the GK-sketch ``percentile_approx``
    (accuracy 10⁴), whose value may differ from exact in the last sketch
    bucket — calibration tolerates that by construction, thresholds are
    heuristics not contracts."""
    if not (0.0 <= pct_lo < pct_hi <= 1.0):
        raise ValueError(f"need 0 <= pct_lo < pct_hi <= 1, got {pct_lo}, {pct_hi}")
    prof = corpus_profile(docs, id_col, text_col,
                          extra={"dup_line_ratio": dup_line_ratio(text_col)})
    aggs = []
    for s in signals:
        if exact:
            aggs.append(F.expr(
                f"percentile({s}, array({pct_lo!r}, {pct_hi!r}))").alias(s))
        else:
            aggs.append(F.percentile_approx(
                s, [pct_lo, pct_hi], 10_000).alias(s))
    row = prof.agg(*aggs).first()
    return [(f"cal_{s}", s, float(row[s][0]), float(row[s][1]))
            for s in signals]
