"""Streaming incremental corpus profiling: per-micro-batch HLL sketch
profiles merged into a persistent corpus profile.

The batch lane (:func:`~owl2jsonschema_js_spark.stats.sketch_profile`) makes
distinct-count state MERGEABLE; this module adds the foreachBatch plumbing so
a document/turn stream keeps a live corpus profile without ever rescanning
what already streamed past:

 * each micro-batch is profiled independently (one JVM partial-agg pass over
   just that batch) and the resulting narrow rows — (part, column, n, nulls,
   sketch binary) — land in the batch's OWN ``batch_id=<n>`` partition via
   dynamic partition overwrite, the same exactly-once replay discipline as
   the dedup monitor's pairs sink (a replayed batch recomputes an identical
   profile and REWRITES its partition; counts are never double-added);
 * the corpus profile is merge-on-read: :func:`read_profile` register-unions
   all batch partitions — O(n_batches x parts x columns) sketch rows, never
   the data. At cluster scale the store is an Iceberg table and periodic
   compaction is a snapshot rewrite; the parquet emulation leaves batch
   partitions in place (the merge stays cheap: sketches are <=16 KiB each).

State is EXTERNALIZED to storage (mirrors dedup_stream's note): corpus
profile state is O(columns), but it must survive restarts/redeploys and be
readable by OTHER jobs (drift baselines, validation planning), which a table
gives and in-memory streaming state does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.stats import SKETCH_LG_K, merge_sketch_profiles

__all__ = ["profile_monitor", "read_profile"]


def profile_monitor(profile_path: str, checkpoint_dir: str,
                    columns: list[str], part_col: str = "part",
                    lg_k: int = SKETCH_LG_K):
    """foreachBatch incremental-profile sink.

    Per micro-batch: one :func:`sketch_profile` pass over the batch, written
    into ``<profile_path>/batch_id=<n>`` with dynamic partition overwrite —
    a crash-replay rewrites that partition with byte-equivalent content
    (the profile of a fixed batch is deterministic) instead of stacking a
    second copy whose ``n``/``nulls`` would double-count. An empty batch
    profiles to zero rows and touches no partition.

    Returns an attach(stream_df) factory; call ``.start()`` on the result.
    The per-batch kernel is exposed as ``attach.write_batch`` for direct
    replay testing, mirroring the dedup monitors."""
    from owl2jsonschema_js_spark.stats import sketch_profile

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (sketch_profile(batch_df, columns, part_col=part_col, lg_k=lg_k)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(profile_path))

    def attach(stream_df: DataFrame):
        return (stream_df.writeStream
                .foreachBatch(write_batch)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    attach.write_batch = write_batch
    return attach


def read_profile(spark: SparkSession, profile_path: str) -> DataFrame:
    """The live corpus profile: all batch partitions register-unioned into
    one ``(part, column, n, nulls, sketch)`` frame — feed it to
    :func:`~owl2jsonschema_js_spark.stats.sketch_estimates` for numbers, or
    merge it onward with later batch profiles / other corpora. Merge-on-read
    over narrow sketch rows only; the profiled data is never re-read."""
    return merge_sketch_profiles(
        spark.read.parquet(profile_path).drop("batch_id"))
