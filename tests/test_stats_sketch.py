"""Mergeable HLL distinct-count profiles (stats.sketch_profile lane).

The incremental-profiling contract: profile an increment, merge with the
stored baseline, never rescan old partitions — estimates stay inside the
HLL error bound and the whole pipeline is deterministic and
storage-round-trippable (the sketch is a binary column in plain parquet).
"""

import pytest

from pyspark.sql import functions as F

from owl2jsonschema_js_spark.stats import (SKETCH_LG_K, merge_sketch_profiles,
                                           sketch_estimates, sketch_profile)

# RSE at lg_k: 1.04 / sqrt(2^lg_k); 6 sigma keeps the assertions
# deterministic-in-practice without hiding real regressions
TOL = 6 * 1.04 / (2 ** SKETCH_LG_K) ** 0.5


def _mkcorpus(spark, lo, hi, mod):
    return spark.range(lo, hi).select(
        (F.col("id") % mod).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % (mod // 2)).cast("string")).alias("s"),
        (F.col("id") % 4).alias("part"))


def _est(df):
    return {r["column"]: r for r in df.collect()}


def test_estimates_close_to_exact(spark):
    df = _mkcorpus(spark, 0, 20000, 3000)
    got = _est(sketch_estimates(sketch_profile(df, ["v", "s"])))
    assert got["v"]["n"] == 20000 and got["v"]["nulls"] == 0
    assert abs(got["v"]["distinct_est"] - 3000) <= TOL * 3000
    assert abs(got["s"]["distinct_est"] - 1500) <= TOL * 1500


def test_merge_of_disjoint_increments_matches_whole(spark):
    """The headline property: baseline + increment merged == whole-corpus
    profile, within the estimator's bound, with n/nulls EXACT — and the
    merged result is deterministic (same inputs -> same estimate)."""
    a = _mkcorpus(spark, 0, 12000, 3000)
    b = _mkcorpus(spark, 12000, 20000, 3500)
    whole = _est(sketch_estimates(sketch_profile(a.unionByName(b), ["v", "s"])))
    m1 = merge_sketch_profiles(sketch_profile(a, ["v", "s"]),
                               sketch_profile(b, ["v", "s"]))
    merged = _est(sketch_estimates(m1))
    for c in ("v", "s"):
        assert merged[c]["n"] == whole[c]["n"] == 20000
        assert merged[c]["nulls"] == whole[c]["nulls"] == 0
        # both estimate the same true cardinality; allow both errors
        assert abs(merged[c]["distinct_est"] - whole[c]["distinct_est"]) \
            <= 2 * TOL * whole[c]["distinct_est"]
    exact = a.unionByName(b).select("v").distinct().count()
    assert abs(merged["v"]["distinct_est"] - exact) <= TOL * exact
    again = _est(sketch_estimates(merge_sketch_profiles(
        sketch_profile(a, ["v", "s"]), sketch_profile(b, ["v", "s"]))))
    assert {c: r["distinct_est"] for c, r in again.items()} == \
           {c: r["distinct_est"] for c, r in merged.items()}


def test_merge_is_associative_across_three_increments(spark):
    a = _mkcorpus(spark, 0, 5000, 900)
    b = _mkcorpus(spark, 5000, 9000, 1100)
    c = _mkcorpus(spark, 9000, 14000, 1300)
    pa, pb, pc = (sketch_profile(x, ["v"]) for x in (a, b, c))
    left = sketch_estimates(merge_sketch_profiles(
        merge_sketch_profiles(pa, pb), pc)).collect()[0]
    flat = sketch_estimates(merge_sketch_profiles(pa, pb, pc)).collect()[0]
    assert left["n"] == flat["n"] == 14000
    assert abs(left["distinct_est"] - flat["distinct_est"]) \
        <= 2 * TOL * flat["distinct_est"]


def test_parquet_roundtrip_then_merge(spark, tmp_path):
    """The checkpoint-manifest shape: a stored baseline profile (plain
    parquet, binary sketch column) merges with a fresh increment's profile
    without rescanning the baseline corpus."""
    base = _mkcorpus(spark, 0, 10000, 2000)
    inc = _mkcorpus(spark, 10000, 15000, 2600)
    path = str(tmp_path / "baseline_profile")
    sketch_profile(base, ["v"]).write.parquet(path)
    stored = spark.read.parquet(path)
    merged = _est(sketch_estimates(merge_sketch_profiles(
        stored, sketch_profile(inc, ["v"]))))
    exact = base.unionByName(inc).select("v").distinct().count()
    assert merged["v"]["n"] == 15000
    assert abs(merged["v"]["distinct_est"] - exact) <= TOL * exact


def test_per_part_estimates_and_null_accounting(spark):
    df = spark.createDataFrame(
        [(None, "p0"), (None, "p0"), (7, "p1"), (7, "p1"), (8, "p1")],
        "v int, part string")
    rows = {r["part"]: r for r in
            sketch_estimates(sketch_profile(df, ["v"]), per_part=True).collect()}
    assert rows["p0"]["nulls"] == 2 and rows["p0"]["distinct_est"] == 0
    assert rows["p1"]["nulls"] == 0 and rows["p1"]["distinct_est"] == 2
    glob = sketch_estimates(sketch_profile(df, ["v"])).collect()[0]
    assert glob["n"] == 5 and glob["nulls"] == 2 and glob["distinct_est"] == 2


def test_unsupported_dtypes_canonicalize_without_losing_distincts(spark):
    """double/timestamp/boolean are not hll_sketch_agg inputs; the string
    canonicalization must preserve their cardinality."""
    df = spark.sql("""
        SELECT CAST(id % 97 AS DOUBLE) / 8 AS d,
               timestamp_micros(CAST(id % 53 AS BIGINT) * 1000000) AS t,
               id % 2 = 0 AS b,
               CAST(id % 4 AS STRING) AS part
        FROM range(0, 5000)""")
    got = _est(sketch_estimates(sketch_profile(df, ["d", "t", "b"])))
    assert abs(got["d"]["distinct_est"] - 97) <= max(2, TOL * 97)
    assert abs(got["t"]["distinct_est"] - 53) <= max(2, TOL * 53)
    assert got["b"]["distinct_est"] == 2


def test_sketch_agg_plan_is_jvm_partial_agg(spark):
    """The pass must be a JVM typed aggregate with map-side partial combine
    (ObjectHashAggregate partial_hllsketchagg) — no Python, no mapInPandas."""
    df = _mkcorpus(spark, 0, 1000, 100)
    plan = sketch_profile(df, ["v"])._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan
    assert "partial_hll_sketch_agg" in plan
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


def test_empty_and_bad_inputs(spark):
    with pytest.raises(ValueError):
        sketch_profile(spark.createDataFrame([], "part string"), [])
    with pytest.raises(ValueError):
        merge_sketch_profiles()
    empty = spark.createDataFrame([], "v int, part string")
    assert sketch_estimates(sketch_profile(empty, ["v"])).count() == 0


def test_vocab_drift_known_overlap(spark):
    """Planted overlap: base vocab 0..2999, current 1500..4499 — true
    intersection 1500, union 4500, jaccard 1/3, new-value rate 1/2."""
    from owl2jsonschema_js_spark.stats import sketch_vocab_drift

    base = spark.range(0, 30000).select((F.col("id") % 3000).alias("v"),
                                        F.lit("p").alias("part"))
    cur = spark.range(0, 30000).select((F.col("id") % 3000 + 1500).alias("v"),
                                       F.lit("p").alias("part"))
    row = sketch_vocab_drift(sketch_profile(base, ["v"]),
                             sketch_profile(cur, ["v"])).collect()[0]
    assert abs(row["base_distinct"] - 3000) <= TOL * 3000
    assert abs(row["union_distinct"] - 4500) <= TOL * 4500
    # intersection rides inclusion-exclusion: allow the summed error
    assert abs(row["est_jaccard"] - 1 / 3) <= 0.05
    assert abs(row["new_value_rate"] - 0.5) <= 0.05


def test_vocab_drift_identical_and_disjoint(spark):
    from owl2jsonschema_js_spark.stats import sketch_vocab_drift

    a = spark.range(0, 20000).select((F.col("id") % 2000).alias("v"),
                                     (F.col("id") % 3).alias("part"))
    same = sketch_vocab_drift(sketch_profile(a, ["v"]),
                              sketch_profile(a, ["v"])).collect()[0]
    # identical profiles: union == both sides EXACTLY (same register state)
    assert same["est_jaccard"] == 1.0 and same["new_value_rate"] == 0.0

    b = spark.range(0, 20000).select((F.col("id") % 2000 + 10_000_000).alias("v"),
                                     (F.col("id") % 3).alias("part"))
    dis = sketch_vocab_drift(sketch_profile(a, ["v"]),
                             sketch_profile(b, ["v"])).collect()[0]
    assert dis["est_jaccard"] <= 0.03          # clamped near zero
    assert dis["new_value_rate"] >= 0.97


def test_negative_zero_folds_like_spark_distinct(spark):
    """Spark's distinct/groupBy equate -0.0 and 0.0; the string
    canonicalization must not split them into two sketch values."""
    df = spark.createDataFrame(
        [(0.0, "p"), (-0.0, "p"), (1.5, "p"), (float("nan"), "p")],
        "d double, part string")
    got = sketch_estimates(sketch_profile(df, ["d"])).collect()[0]
    exact = df.select("d").distinct().count()   # 3: {0.0, 1.5, NaN}
    assert exact == 3
    assert got["distinct_est"] == 3


def test_complex_types_sketch_via_injective_json(spark):
    """array/struct columns must NOT ride the plain string cast: Spark
    renders array<string> elements unquoted, so ['a, b'] and ['a','b'] both
    print '[a, b]' and the sketch would silently under-count. to_json
    escapes and distinguishes them."""
    df = spark.createDataFrame(
        [(["a, b"], "p"), (["a", "b"], "p"), (["a", "b"], "p")],
        "v array<string>, part string")
    got = sketch_estimates(sketch_profile(df, ["v"])).collect()[0]
    assert got["distinct_est"] == df.select("v").distinct().count() == 2

    emb = spark.range(0, 500).selectExpr(
        "array(CAST(id % 50 AS DOUBLE), CAST(id % 7 AS DOUBLE)) AS e",
        "CAST(id % 4 AS STRING) AS part")
    g2 = sketch_estimates(sketch_profile(emb, ["e"])).collect()[0]
    exact = emb.select("e").distinct().count()
    assert abs(g2["distinct_est"] - exact) <= max(2, TOL * exact)


def test_double_canonicalization_fuzz_exact_small_sets(spark):
    """For small distinct sets the HLL sketch is EXACT (list/sparse mode),
    so canonicalized double columns must match Spark's own distinct count
    bit-for-bit — including +-0.0, NaN, infinities, denormals, and values
    differing only in the last ulp."""
    import math
    import random

    rng = random.Random(0xC0FFEE)
    specials = [0.0, -0.0, float("nan"), float("inf"), float("-inf"),
                5e-324, -5e-324, 1.0, 1.0 + 2 ** -52]
    for trial in range(3):
        pool = specials + [rng.uniform(-1e6, 1e6) for _ in range(12)]
        vals = [rng.choice(pool) for _ in range(200)]
        df = spark.createDataFrame([(v, "p") for v in vals],
                                   "d double, part string")
        got = sketch_estimates(sketch_profile(df, ["d"])).collect()[0]
        exact = df.select("d").distinct().count()
        assert got["distinct_est"] == exact, (trial, got, exact, sorted(
            {repr(v) for v in vals}))
