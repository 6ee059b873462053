"""Structured Streaming validation (stretch per SURVEY.md §2.2: the north rule
is batch-over-Iceberg; this covers incremental arrivals).

Row-level rules apply unchanged to a stream — they're stateless Column
predicates, so the same compiled RulePlan drives both batch and streaming.
Group/table rules need state; here:

 * per-window per-role cardinality with a watermark (late data beyond the
   watermark is dropped by Spark's state eviction, the standard late-data
   policy),
 * violations written via foreachBatch using the SAME batch extraction code
   (each micro-batch is a DataFrame), which keeps one implementation of the
   violation schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.compile import RulePlan
from owl2jsonschema_js_spark.runner import ValidationRunner


def checked_stream(stream_df: DataFrame, plan: RulePlan) -> DataFrame:
    """Stateless: input stream + ok__<rule> columns + ok_all."""
    runner = ValidationRunner(plan)
    return runner._row_checked(runner._with_partition(stream_df))


def windowed_role_counts(
    stream_df: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-window (conv_id, role) counts — the streaming analog of
    the C5/C6 cardinality rules; late rows past the watermark are dropped."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "conv_id", "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_monitor(baseline: dict, out_path: str, checkpoint_dir: str,
                  min_count: int = 50):
    """foreachBatch drift sink: per micro-batch, aggregate the per-role
    text-length histogram (one partial-agg groupBy of the batch — the only
    distributed work), run KS+PSI against the checkpointed baseline profile
    (driver-side on roles x 32 bins), and append one JSON line per batch to
    ``out_path``. The length lane is stateless so it streams cleanly;
    turn-gap drift needs cross-batch per-conversation ordering state and
    stays on the batch path (drift.py), which is the honest split.

    Replay note: the jsonl feed is at-least-once — a crash-replayed batch
    re-appends its line (same ``batch_id``, recomputed-identical content);
    consumers key on batch_id. A driver-local line append has no
    partition-overwrite analog; at cluster scale this feed is a message
    bus/metrics emit, where per-batch-id dedup is the consumer contract.

    Returns an attach(stream_df) factory like :func:`violations_writer`."""
    import json

    from owl2jsonschema_js_spark.drift import (collect_hists, drift_report,
                                               length_histogram, N_BINS)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = {"len_hist": collect_hists(length_histogram(batch_df)),
               "n_bins": N_BINS}
        rep = drift_report(cur, baseline, min_count=min_count)
        with open(out_path, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, **rep},
                               sort_keys=True) + "\n")

    def attach(stream_df: DataFrame):
        return (stream_df.writeStream
                .foreachBatch(write_batch)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    attach.write_batch = write_batch  # direct handle for replay testing
    return attach


def violations_writer(plan: RulePlan, out_path: str, checkpoint_dir: str,
                      catalog: DataFrame | None = None):
    """foreachBatch sink: run the batch violation extraction on each
    micro-batch and write it into the batch's own ``batch_id=<n>`` partition
    (dynamic partition overwrite — the repo's exactly-once replay
    discipline, same as the dedup pairs and profile monitors: a crash-replay
    recomputes the same deterministic violation set and REWRITES the
    partition instead of appending a duplicate copy; a plain append here
    would double every replayed batch's violation rows). Returns the query
    factory — call .start() on attach(stream). `catalog` is the referential
    dimension (a static DataFrame joined into every micro-batch)."""
    runner = ValidationRunner(plan)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = runner.run(batch_df, catalog=catalog)
        (res.violations.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(out_path))

    def attach(stream_df: DataFrame):
        return (stream_df.writeStream
                .foreachBatch(write_batch)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    attach.write_batch = write_batch  # direct handle for replay testing
    return attach
