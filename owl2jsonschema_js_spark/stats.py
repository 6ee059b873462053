"""Single-pass per-partition column profiler (north rule: "per-column stats …
computed in a single mapInPandas/Arrow pass per Iceberg partition",
BASELINE.json:6).

One ``repartition(part_col)`` co-locates each table partition's rows in one
task; one ``mapInPandas`` then computes, for every profiled column
simultaneously (amortizing the scan):

  * row count, null count / null rate,
  * min/max (numeric + lexicographic),
  * exact distinct count via accumulated 64-bit value hashes
    (``pd.util.hash_pandas_object``), **capped**: past ``distinct_cap`` unique
    hashes the profiler stops tracking and flags ``distinct_overflow`` — at
    100 TB per-partition exact distinct cannot be unbounded (SURVEY.md §7
    hard-part #1); the companion :func:`approx_distinct` (HLL++,
    ``approx_count_distinct``) is the scale path for global distincts,
  * string length histogram over 32 log2-width bins + total length.

Everything inside the pass is pandas/numpy vectorized — no per-row Python.

Pickling note: the accumulator state class is defined INSIDE :func:`profile`
so cloudpickle serializes it by value. A module-level class would pickle by
reference and fail on executors that don't have this package on PYTHONPATH
(found by driving the library from a non-repo cwd — keep it this way).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 32

PROFILE_SCHEMA = (
    "part string, column string, n long, nulls long, "
    "n_distinct long, distinct_overflow boolean, "
    "min_num double, max_num double, min_str string, max_str string, "
    "sum_len double, len_hist array<long>"
)

_EMPTY_COLUMNS = ["part", "column", "n", "nulls", "n_distinct", "distinct_overflow",
                  "min_num", "max_num", "min_str", "max_str", "sum_len", "len_hist"]


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    part_col: str = "part",
    distinct_cap: int = 1 << 21,
) -> DataFrame:
    """-> (part, column, n, nulls, n_distinct, distinct_overflow, min/max,
    sum_len, len_hist). One Arrow pass per partition."""
    cols = columns or [c for c in df.columns if c != part_col]
    n_bins = N_BINS
    empty_cols = list(_EMPTY_COLUMNS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        class ColState:
            __slots__ = ("n", "nulls", "min_num", "max_num", "min_str", "max_str",
                         "hashes", "overflow", "sum_len", "len_hist")

            def __init__(self):
                self.n = 0
                self.nulls = 0
                self.min_num = None
                self.max_num = None
                self.min_str = None
                self.max_str = None
                self.hashes: list[np.ndarray] = []
                self.overflow = False
                self.sum_len = 0.0
                self.len_hist = np.zeros(n_bins, dtype=np.int64)

            def update(self, s: pd.Series) -> None:
                self.n += len(s)
                nonnull = s.dropna()
                self.nulls += len(s) - len(nonnull)
                if nonnull.empty:
                    return
                if pd.api.types.is_numeric_dtype(nonnull) or \
                        pd.api.types.is_datetime64_any_dtype(nonnull):
                    vals = nonnull
                    if pd.api.types.is_datetime64_any_dtype(vals):
                        vals = vals.astype("int64") / 1e9  # epoch seconds
                    lo, hi = float(vals.min()), float(vals.max())
                    self.min_num = lo if self.min_num is None else min(self.min_num, lo)
                    self.max_num = hi if self.max_num is None else max(self.max_num, hi)
                else:
                    astr = nonnull.astype(str)
                    lo, hi = astr.min(), astr.max()
                    self.min_str = lo if self.min_str is None else min(self.min_str, lo)
                    self.max_str = hi if self.max_str is None else max(self.max_str, hi)
                    lens = astr.str.len().to_numpy()
                    self.sum_len += float(lens.sum())
                    bins = np.minimum(n_bins - 1, np.floor(np.log2(lens + 1)).astype(np.int64))
                    self.len_hist += np.bincount(bins, minlength=n_bins)
                if not self.overflow:
                    h = pd.util.hash_pandas_object(nonnull, index=False).to_numpy()
                    self.hashes.append(h)
                    if sum(a.size for a in self.hashes) > 4 * distinct_cap:
                        self._compact()

            def _compact(self) -> None:
                u = np.unique(np.concatenate(self.hashes))
                if u.size > distinct_cap:
                    self.overflow = True
                    self.hashes = []
                else:
                    self.hashes = [u]

            def finish(self) -> dict:
                n_distinct = -1
                if not self.overflow:
                    u = np.unique(np.concatenate(self.hashes)) if self.hashes else np.empty(0)
                    if u.size > distinct_cap:
                        self.overflow = True
                    else:
                        n_distinct = int(u.size)
                return dict(
                    n=self.n, nulls=self.nulls,
                    n_distinct=n_distinct, distinct_overflow=self.overflow,
                    min_num=self.min_num, max_num=self.max_num,
                    min_str=self.min_str, max_str=self.max_str,
                    sum_len=self.sum_len, len_hist=self.len_hist.tolist(),
                )

        acc: dict[tuple[str, str], ColState] = {}
        for pdf in batches:
            for part, sub in pdf.groupby(part_col, sort=False):
                for c in cols:
                    st = acc.setdefault((str(part), c), ColState())
                    st.update(sub[c])
        rows = [{"part": part, "column": c, **st.finish()} for (part, c), st in acc.items()]
        yield pd.DataFrame(rows) if rows else pd.DataFrame(columns=empty_cols)

    return df.repartition(F.col(part_col)).mapInPandas(run, PROFILE_SCHEMA)


def approx_distinct(df: DataFrame, columns: list[str], part_col: str = "part") -> DataFrame:
    """Companion HLL++ pass: global + per-partition approximate distincts via
    approx_count_distinct (built-in partial+final aggregation — the scale path
    past the exact-hash cap)."""
    aggs = [F.approx_count_distinct(c).alias(c) for c in columns]
    per_part = df.groupBy(F.col(part_col).cast("string").alias("part")).agg(*aggs)
    stack = ", ".join(f"'{c}', `{c}`" for c in columns)
    return per_part.selectExpr(
        "part", f"stack({len(columns)}, {stack}) as (column, approx_distinct)")


# --------------------------------------------------------------------------
# mergeable distinct-count sketches (incremental profiling)
# --------------------------------------------------------------------------

SKETCH_LG_K = 14  # DataSketches HLL lgConfigK: ~0.6% RSE, <=16 KiB dense

# hll_sketch_agg's accepted input types; anything else is canonicalized
# below via a distinct-preserving string cast
_SKETCHABLE = {"int", "bigint", "string", "binary"}


def _sketch_key(df: DataFrame, c: str):
    """Column expression hll_sketch_agg accepts, distinct-count-preserving.

    int/bigint/string/binary pass through (tinyint/smallint widen to int —
    lossless). Everything else casts to string: Spark's casts are injective
    on the values that matter for a distinct count (double -> shortest
    round-trip literal, timestamp -> microsecond text, boolean ->
    'true'/'false'), so the sketch of the strings estimates the same
    cardinality as the source column. One float quirk handled explicitly:
    Spark's own distinct/groupBy semantics equate -0.0 with 0.0, but their
    string forms differ — ``+ 0.0`` (IEEE: -0.0 + 0.0 == +0.0) folds them
    before the cast so the sketch agrees with ``count(DISTINCT col)``."""
    t = df.schema[c].dataType.simpleString()
    if t in _SKETCHABLE:
        return F.col(c)
    if t in ("tinyint", "smallint"):
        return F.col(c).cast("int")
    if t in ("float", "double"):
        return (F.col(c) + F.lit(0.0)).cast("string")
    if t.startswith(("array<", "struct<", "map<")):
        # NOT the plain string cast: Spark renders array<string> elements
        # unquoted, so ['a, b'] and ['a','b'] both print '[a, b]' and the
        # sketch silently UNDER-counts; to_json escapes, so it is injective
        return F.to_json(F.col(c))
    return F.col(c).cast("string")


def sketch_profile(df: DataFrame, columns: list[str] | None = None,
                   part_col: str = "part", lg_k: int = SKETCH_LG_K) -> DataFrame:
    """Per-partition MERGEABLE distinct-count profile:
    ``(part, column, n bigint, nulls bigint, sketch binary)``.

    The sketch column carries DataSketches HLL bytes (``hll_sketch_agg`` —
    a JVM typed aggregate with map-side partial combine; no Python in the
    pass). Unlike :func:`approx_distinct`'s scalar estimates, sketches
    SURVIVE storage and MERGE: write this frame next to the checkpoint
    manifest (plain parquet — the binary column round-trips), and a later
    run over only an increment unions its profile with the stored one via
    :func:`merge_sketch_profiles` — corpus-level distinct counts without
    ever rescanning old partitions, the 10^12-turn incremental-profiling
    shape. Merging loses no accuracy: dense-mode union is register-wise
    max, so ``estimates(merge(profile(A), profile(B)))`` carries the same
    error bound as ``estimates(profile(A UNION B))`` — but the two are NOT
    bit-identical (DataSketches sketches promote list -> set -> dense at
    data-dependent points, so union-of-sketches and sketch-of-union can
    hold slightly different state; measured ~0.2% apart at 3.5k distinct).
    Both are fully deterministic for the same inputs. Accuracy: RSE ~=
    1.04 / sqrt(2^lg_k) (~0.8% at the default 14); tested against exact
    distinct counts in tests/test_stats_sketch.py.
    """
    cols = columns or [c for c in df.columns if c != part_col]
    if not cols:
        raise ValueError("sketch_profile needs at least one column")
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}"))
        aggs.append(F.hll_sketch_agg(_sketch_key(df, c), lg_k).alias(f"__sk_{c}"))
    per = df.groupBy(F.col(part_col).cast("string").alias("part")).agg(*aggs)
    stack = ", ".join(f"'{c}', `__nulls_{c}`, `__sk_{c}`" for c in cols)
    return per.selectExpr(
        "part", "__n AS n",
        f"stack({len(cols)}, {stack}) AS (column, nulls, sketch)"
    ).select("part", "column", "n", "nulls", "sketch")


def merge_sketch_profiles(*profiles: DataFrame) -> DataFrame:
    """Union sketch profiles of ROW-DISJOINT inputs (a stored baseline plus
    increments) into one profile of their union — same schema back, so
    merging is associative and the result stores like any other profile.

    ``n``/``nulls`` add (correct only because increments are disjoint —
    re-merging the same rows double-counts them, the usual manifest
    contract); the sketches union losslessly regardless (register-wise max
    is idempotent). One narrow shuffle of O(parts x columns) sketch rows —
    never the data."""
    if not profiles:
        raise ValueError("merge_sketch_profiles needs at least one profile")
    acc = profiles[0]
    for p in profiles[1:]:
        acc = acc.unionByName(p)
    return (acc.groupBy("part", "column")
            .agg(F.sum("n").alias("n"), F.sum("nulls").alias("nulls"),
                 F.hll_union_agg("sketch").alias("sketch"))
            .select("part", "column", "n", "nulls", "sketch"))


def sketch_vocab_drift(baseline: DataFrame, current: DataFrame) -> DataFrame:
    """Vocabulary drift between two sketch profiles — the distinct-SET
    companion to drift.py's distribution checks (KS/PSI see a shifted
    histogram; they cannot see a column whose value set churned while its
    length distribution stayed put, e.g. a tool-name column after a fleet
    redeploy).

    Computed ENTIRELY from stored sketches (no data rescanned)::

        (column, base_distinct, cur_distinct, union_distinct,
         est_jaccard, new_value_rate)

    where ``est_jaccard`` estimates |base ∩ cur| / |base ∪ cur| by
    inclusion–exclusion over the HLL estimates and ``new_value_rate``
    estimates the fraction of the CURRENT value set unseen in the baseline
    — the "how much new vocabulary arrived" number an operator alerts on.

    Accuracy note (inherent to inclusion–exclusion, stated plainly): the
    intersection is a DIFFERENCE of ~1%-RSE estimates, so its relative
    error grows as the true intersection shrinks relative to the union —
    near-disjoint sets can even yield small negative intersections (clamped
    to 0 here). Thresholds on these numbers are heuristics; both estimates
    are deterministic for the same inputs."""
    b = (baseline.groupBy("column")
         .agg(F.hll_union_agg("sketch").alias("skb")))
    c = (current.groupBy("column")
         .agg(F.hll_union_agg("sketch").alias("skc")))
    j = (b.join(c, "column")
         .select("column",
                 F.hll_sketch_estimate("skb").alias("base_distinct"),
                 F.hll_sketch_estimate("skc").alias("cur_distinct"),
                 F.hll_sketch_estimate(F.hll_union("skb", "skc"))
                 .alias("union_distinct")))
    inter = F.greatest(
        F.col("base_distinct") + F.col("cur_distinct") - F.col("union_distinct"),
        F.lit(0))
    return (j.withColumn("est_jaccard",
                         F.when(F.col("union_distinct") > 0,
                                inter / F.col("union_distinct"))
                         .otherwise(F.lit(0.0)))
            .withColumn("new_value_rate",
                        F.when(F.col("cur_distinct") > 0,
                               (F.col("cur_distinct") - inter)
                               / F.col("cur_distinct"))
                        .otherwise(F.lit(0.0))))


def sketch_estimates(profile: DataFrame, per_part: bool = False) -> DataFrame:
    """Read a sketch profile back as numbers.

    ``per_part=False`` (default): one more union across parts ->
    ``(column, n, nulls, distinct_est)`` global per-column estimates.
    ``per_part=True``: ``(part, column, n, nulls, distinct_est)`` with each
    partition's own estimate."""
    if per_part:
        return profile.select(
            "part", "column", "n", "nulls",
            F.hll_sketch_estimate("sketch").alias("distinct_est"))
    return (profile.groupBy("column")
            .agg(F.sum("n").alias("n"), F.sum("nulls").alias("nulls"),
                 F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                 .alias("distinct_est")))
