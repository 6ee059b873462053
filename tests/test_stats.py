"""Profiler tests (SURVEY.md §5.2): exact values vs pandas-computed truth on the
smoke fixture; HLL++ companion within documented rsd; overflow cap behavior."""

import numpy as np
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.stats import N_BINS, approx_distinct, profile


def _with_part(df):
    return df.withColumn("part", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int"))


def test_profile_exact_counts(spark, fixture60):
    df = _with_part(fixture60.to_spark(spark))
    prof = {(r["part"], r["column"]): r for r in profile(df).collect()}
    pdf = df.toPandas()
    for part, sub in pdf.groupby("part"):
        key = (str(part), "text")
        r = prof[key]
        assert r["n"] == len(sub)
        assert r["nulls"] == int(sub["text"].isna().sum())
        nonnull = sub["text"].dropna()
        assert r["n_distinct"] == nonnull.nunique()
        assert r["min_str"] == nonnull.min()
        assert r["max_str"] == nonnull.max()
        assert r["sum_len"] == float(nonnull.str.len().sum())
        lens = nonnull.str.len().to_numpy()
        bins = np.minimum(N_BINS - 1, np.floor(np.log2(lens + 1)).astype(int))
        assert r["len_hist"] == np.bincount(bins, minlength=N_BINS).tolist()
        # numeric column
        rn = prof[(str(part), "turn_idx")]
        assert rn["min_num"] == float(sub["turn_idx"].min())
        assert rn["max_num"] == float(sub["turn_idx"].max())


def test_profile_timestamp_minmax(spark, fixture60):
    df = _with_part(fixture60.to_spark(spark))
    prof = {(r["part"], r["column"]): r for r in profile(df, columns=["ts"]).collect()}
    pdf = df.toPandas()
    for part, sub in pdf.groupby("part"):
        r = prof[(str(part), "ts")]
        assert abs(r["min_num"] - sub["ts"].min().timestamp()) < 1e-3
        assert abs(r["max_num"] - sub["ts"].max().timestamp()) < 1e-3


def test_distinct_overflow_cap(spark):
    df = spark.range(5000).select(
        F.lit(0).alias("part"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    r = profile(df, columns=["v"], distinct_cap=1000).collect()[0]
    assert r["distinct_overflow"] is True
    assert r["n_distinct"] == -1
    # companion HLL++ still answers
    a = approx_distinct(df, ["v"]).collect()[0]
    assert abs(a["approx_distinct"] - 5000) / 5000 < 0.05


def test_approx_distinct_matches_exact_smallscale(spark, fixture60):
    df = _with_part(fixture60.to_spark(spark))
    exact = {(r["part"], r["column"]): r["n_distinct"]
             for r in profile(df, columns=["role", "conv_id"]).collect()}
    approx = {(r["part"], r["column"]): r["approx_distinct"]
              for r in approx_distinct(df, ["role", "conv_id"]).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2, 0.05 * v)
