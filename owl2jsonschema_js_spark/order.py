"""Stable turn ordering + turn-gap extraction.

North rule: "turn ordering is made stable with a window over conv_id ordered by
(turn_idx, ts) so per-turn text equality … holds row-for-row" (BASELINE.json:6).

Two implementations of gap extraction:

 * :func:`turn_gaps` — the SCALE path: hash-repartition by conv_id, sort within
   partitions by (conv_id, turn_idx, ts), then a mapInPandas diff with
   carry-over state across Arrow batches. No global window, no single-task
   hot-conversation blowup beyond the unavoidable one-conv-one-partition
   residency (Arrow streams it in batches instead of materializing the whole
   window buffer).
 * :func:`turn_gaps_window` — the window (lag) formulation, used to prove the
   scale path row-for-row equal on fixtures.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAPS_SCHEMA = "conv_id string, turn_idx int, role string, gap_s double"


def with_stable_order(df: DataFrame, order_col: str = "turn_seq") -> DataFrame:
    """row_number over (conv_id | turn_idx, ts): the deterministic per-turn
    index used for row-for-row text equality against the reference."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return df.withColumn(order_col, F.row_number().over(w))


def turn_gaps_window(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    # TIMESTAMP_NTZ (parquet default) has no direct double cast — go via ts
    sec = F.col("ts").cast("timestamp").cast("double")
    return df.select(
        "conv_id", "turn_idx", "role",
        (sec - F.lag(sec).over(w)).alias("gap_s"),
    )


def turn_gaps(df: DataFrame) -> DataFrame:
    """Scale path: repartition+sortWithinPartitions+mapInPandas with carry."""
    sorted_df = (
        df.select("conv_id", "turn_idx", "role", "ts")
        .repartition(F.col("conv_id"))
        .sortWithinPartitions("conv_id", "turn_idx", "ts")
    )

    def diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_conv: str | None = None
        carry_ts = None
        for pdf in batches:
            if pdf.empty:
                continue
            ts = pd.to_datetime(pdf["ts"])
            # .copy() detaches from the .dt accessor's parent so the carry
            # assignment below is a plain write (under pandas copy-on-write the
            # chained form would be silently discarded).
            gap = ts.groupby(pdf["conv_id"].values).diff().dt.total_seconds().copy()
            if carry_conv is not None and pdf["conv_id"].iloc[0] == carry_conv:
                first = pdf.index[0]
                gap.loc[first] = (ts.iloc[0] - carry_ts).total_seconds()
            carry_conv = pdf["conv_id"].iloc[-1]
            carry_ts = ts.iloc[-1]
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "role": pdf["role"],
                "gap_s": gap,
            })

    return sorted_df.mapInPandas(diff, GAPS_SCHEMA)
