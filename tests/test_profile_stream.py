"""Streaming incremental sketch profiling (streaming/profile_stream.py):
per-batch profiles in batch_id partitions, merge-on-read corpus profile,
exactly-once counts under crash-replay."""

from pyspark.sql import functions as F

from owl2jsonschema_js_spark.stats import sketch_estimates, sketch_profile
from owl2jsonschema_js_spark.streaming.profile_stream import (profile_monitor,
                                                              read_profile)

COLS = ["user_id", "props"]


def _events(spark, n=400):
    return spark.range(0, n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 37).alias("user_id"),
        F.concat(F.lit("p"), (F.col("id") % 90).cast("string")).alias("props"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("part"))


def _est(profile):
    return {r["column"]: r for r in sketch_estimates(profile).collect()}


def test_streamed_profile_matches_batch_profile(spark, tmp_path):
    """availableNow micro-batches over the same rows -> the merged stored
    profile reports the same n/nulls and in-bound estimates as one batch
    pass over the whole table."""
    src = str(tmp_path / "src")
    prof = str(tmp_path / "prof")
    ckpt = str(tmp_path / "ckpt")
    df = _events(spark)
    # several files => several micro-batches with maxFilesPerTrigger
    df.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = profile_monitor(prof, ckpt, COLS)(stream).start()
    q.awaitTermination(120)

    stored = _est(read_profile(spark, prof))
    whole = _est(sketch_profile(df, COLS))
    for c in COLS:
        assert stored[c]["n"] == whole[c]["n"] == 400
        assert stored[c]["nulls"] == whole[c]["nulls"] == 0
    exact_u = df.select("user_id").distinct().count()
    assert abs(stored["user_id"]["distinct_est"] - exact_u) <= max(2, 0.05 * exact_u)
    # more than one batch actually ran (else the test proves nothing)
    n_batches = (spark.read.parquet(prof)
                 .select("batch_id").distinct().count())
    assert n_batches >= 2


def test_replay_rewrites_not_duplicates(spark, tmp_path):
    """The exactly-once contract: re-running a batch's write (the streaming
    engine's crash-replay) leaves the stored profile IDENTICAL — n is never
    double-counted and the batch's partition is rewritten, not stacked."""
    prof = str(tmp_path / "prof")
    attach = profile_monitor(prof, str(tmp_path / "ckpt"), COLS)
    df = _events(spark)
    half = df.where(F.col("event_id") < 200)
    rest = df.where(F.col("event_id") >= 200)

    attach.write_batch(half, 0)
    attach.write_batch(rest, 1)
    before = {(r["part"], r["column"]): (r["n"], r["nulls"]) for r in
              read_profile(spark, prof).collect()}
    est_before = _est(read_profile(spark, prof))

    attach.write_batch(rest, 1)  # replay
    after = {(r["part"], r["column"]): (r["n"], r["nulls"]) for r in
             read_profile(spark, prof).collect()}
    est_after = _est(read_profile(spark, prof))
    assert after == before
    assert {c: r["distinct_est"] for c, r in est_after.items()} == \
           {c: r["distinct_est"] for c, r in est_before.items()}
    assert est_after["user_id"]["n"] == 400


def test_empty_batch_touches_nothing(spark, tmp_path):
    prof = str(tmp_path / "prof")
    attach = profile_monitor(prof, str(tmp_path / "ckpt"), COLS)
    df = _events(spark)
    attach.write_batch(df, 0)
    before = sorted(map(tuple, read_profile(spark, prof).drop("sketch").collect()))
    attach.write_batch(df.where(F.lit(False)), 1)  # empty micro-batch
    after = sorted(map(tuple, read_profile(spark, prof).drop("sketch").collect()))
    assert after == before
