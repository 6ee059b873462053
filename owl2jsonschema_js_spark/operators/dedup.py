"""Deduplication operators over a documents table (doc_id, text, ...).

Training-data-pipeline operators, Spark-first:

 * :func:`exact_dups` — hash-groupBy on the text itself (Catalyst partial agg).
 * :func:`ngram_jaccard_pairs` — EXACT n-gram-set Jaccard via an inverted-index
   token join (explode -> join on token -> shared counts), NOT an all-pairs
   cross join: pairs sharing zero n-grams are never materialized, which is the
   property that survives a 100× scale-up. Jaccard = sh / (|A|+|B|-sh).
 * :func:`minhash_lsh_pairs` — MinHash signatures (xxhash64 per seed, JVM-side
   array_min over the shingle array) banded into LSH buckets; candidate pairs
   from same-bucket joins, then exact-Jaccard verification of candidates only.
 * :func:`simhash_pairs` — 64-bit SimHash from token hashes (bit-sum
   aggregation, all JVM expressions), near-dup candidates from 16-bit band
   collisions, verified by Hamming distance.

All implementations are pure DataFrame ops — no Python UDFs.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text", distinct: bool = True):
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    return F.array_distinct(t) if distinct else t


def word_ngrams_col(n: int, text_col: str = "text"):
    """Distinct word n-grams as an array column (n=1 -> distinct tokens)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    # slide a window of n over the token array; join with spaces
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))


def char_shingles_col(k: int = 5, text_col: str = "text"):
    """Distinct character k-shingles (classic MinHash input)."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, F.lit(k))))


def exact_dups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text, n_dups) for texts appearing more than
    once. Hash aggregation with map-side combine; at scale, group on
    xxhash64(text) first to shrink shuffle width."""
    return (
        docs.groupBy(F.col(text_col).alias("text"))
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def _pair_jaccard(grams: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """grams: (id, gram array) -> exact Jaccard per co-occurring pair via
    inverted-index join. Output: (a_id, b_id, jaccard)."""
    tok = grams.select(F.col(id_col).alias("id"), F.explode("grams").alias("g"))
    sizes = grams.select(F.col(id_col).alias("id"), F.size("grams").alias("ns"))
    a, b = tok.alias("a"), tok.alias("b")
    shared = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    return (
        shared
        .join(sizes.withColumnsRenamed({"id": "a_id", "ns": "na"}), "a_id")
        .join(sizes.withColumnsRenamed({"id": "b_id", "ns": "nb"}), "b_id")
        .select(
            "a_id", "b_id",
            (F.col("sh").cast("double")
             / (F.col("na") + F.col("nb") - F.col("sh"))).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 2, threshold: float = 0.8,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a_id, b_id, jaccard) for word-n-gram Jaccard >= threshold."""
    grams = docs.select(F.col(id_col), word_ngrams_col(n, text_col).alias("grams"))
    return _pair_jaccard(grams, id_col).where(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard.

    Pipeline: shingles -> per-seed min of xxhash64(shingle, seed) (signature) ->
    band keys = xxhash64 over each band's rows -> same-bucket join for
    candidates (the ONLY pair-generating step; its cost is bucket-local) ->
    exact Jaccard on candidates only -> threshold. With b bands of r rows the
    usual S-curve applies: P(candidate) = 1-(1-j^r)^b."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    grams = docs.select(F.col(id_col).alias("id"),
                        char_shingles_col(shingle_k, text_col).alias("grams"))
    sig_cols = [
        F.array_min(F.transform(F.col("grams"), lambda s: F.xxhash64(s, F.lit(i)))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sigs = grams.select("id", "grams", *sig_cols)
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
        .alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select("id", "grams", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band_no"), band_cols[b].alias("bucket"))
        for b in range(bands)])).alias("bb"))
    banded = banded.select("id", "grams", "bb.band_no", "bb.bucket")
    a, b_ = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b_, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
                F.col("a.grams").alias("ga"), F.col("b.grams").alias("gb"))
        .dropDuplicates(["a_id", "b_id"])
    )
    j = (F.size(F.array_intersect("ga", "gb")).cast("double")
         / F.size(F.array_union("ga", "gb")))
    return cands.select("a_id", "b_id", j.alias("jaccard")) \
                .where(F.col("jaccard") >= threshold)


def simhash_col(text_col: str = "text", bits: int = 64):
    """64-bit SimHash as a single JVM expression: sum over distinct tokens of
    (+1/-1) per bit of xxhash64(token), then sign -> bit. aggregate() keeps it
    inside codegen — no shuffle, no Python."""
    toks = tokens_col(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def _bit_sum(i: int):
        # closure factory: F.aggregate inspects lambda arity, so the bit index
        # must be captured in the closure, not as a default parameter
        return F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                                        F.lit(1)).otherwise(F.lit(-1)),
        )

    bit_sums = [_bit_sum(i) for i in range(bits)]
    out = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        out = out.bitwiseOR(F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), i))
                            .otherwise(F.lit(0).cast("long")))
    return out


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 6,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of four 16-bit bands
    (any pair within Hamming<=3 of a band is guaranteed caught; wider distances
    probabilistically), verified by full Hamming distance."""
    sh = docs.select(F.col(id_col).alias("id"), simhash_col(text_col).alias("sim"))
    bands = sh.select(
        "id", "sim",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_no"),
                     F.shiftright(F.col("sim"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("bucket"))
            for b in range(4)])).alias("bb"),
    ).select("id", "sim", "bb.band_no", "bb.bucket")
    a, b_ = bands.alias("a"), bands.alias("b")
    return (
        a.join(b_, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
                hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"))
        .dropDuplicates(["a_id", "b_id"])
        .where(F.col("hamming") <= max_hamming)
    )
