"""Explicit skew-defeating primitives (north rule: "partitioning / shuffle /
skew handled explicitly").

Where the engine's built-in checks dodge skew structurally (full-key hashing
for uniqueness, partial aggregation for counts), some per-group computations
are NOT algebraic — collect-style state, medians, per-conversation sequence
checks. For those:

 * :func:`salted_group_agg` — classic two-phase salted aggregation for
   algebraic-but-heavy aggs: group by (key, salt) first (spreads a hot key
   over `n_salts` reducers), then merge the partials by key.
 * :func:`grouped_map_sorted` — per-group sequential logic without
   `applyInPandas`'s whole-group materialization: repartition by group key +
   sortWithinPartitions + mapInPandas streaming with cross-batch carry, so a
   hot conversation streams through Arrow batches instead of occupying one
   task's memory as a single pandas group. (applyInPandas materializes each
   group fully — fine for normal groups, fatal for a 30%-of-table one.)
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> dict:
    """Measure key skew instead of guessing it: one partial-agg
    ``groupBy(key).count()`` (hot-key safe — the hot key contributes one
    partial row per mapper), then an O(keys)-width rollup and a TakeOrdered
    top-``top_n``. Returns a driver-side dict, O(top_n) size::

        {n_rows, n_keys, max_share, top: [(key, n, share), ...]}

    This is the number the engine's skew decisions should consume: salt width
    for :func:`salted_group_agg` (see :func:`recommend_salts`), whether a hot
    conversation makes the bucketed repeated-run lane's one-task-per-
    conversation trade acceptable (`sources/tableio.py write_bucketed`), and
    whether ``uniqueness='gated'`` will flag a meaningful subset. SURVEY §4.2
    mandates choosing salt width "from observed key histograms" — this is the
    observation."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        tot = counts.agg(
            F.count(F.lit(1)).alias("keys"),
            F.sum("n").alias("rows"),
        ).first()
        top = counts.orderBy(F.desc("n")).limit(top_n).collect()
    finally:
        counts.unpersist()
    rows = tot["rows"] or 0
    share = (lambda n: n / rows if rows else 0.0)
    return {
        "n_rows": rows,
        "n_keys": tot["keys"],
        "max_share": share(top[0]["n"]) if top else 0.0,
        "top": [(r[key], r["n"], share(r["n"])) for r in top],
    }


def recommend_salts(profile: dict, target_share: float = 1 / 32) -> int:
    """Salt width so the hottest key's per-reducer slice is ~``target_share``
    of the table (default: one core's worth on a 32-slot stage). Clean
    (unskewed) profiles recommend 1 — salting costs a second shuffle phase and
    should not be paid by default."""
    import math

    if profile["max_share"] <= target_share:
        return 1
    return 2 ** math.ceil(math.log2(profile["max_share"] / target_share))


def salted_group_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int | str = 16,
    salt_from: str | None = None,
    profile: dict | None = None,
    target_share: float = 1 / 32,
) -> DataFrame:
    """Two-phase agg: groupBy(key, salt) -> partials; groupBy(key) -> merged.

    `partial_aggs` run within (key, salt); `merge_aggs` combine the partial
    columns per key. Salt derives from `salt_from` (a column whose values
    spread within the hot key, e.g. turn_idx) or a hash of the whole row
    position via monotonically_increasing_id.

    ``n_salts='auto'`` closes SURVEY §4.2's observe->decide loop: the width
    comes from :func:`recommend_salts` over ``profile`` (pass a stored
    :func:`key_skew_profile` to reuse an ingest-time measurement) or, when no
    profile is given, from one key-width measuring scan of ``df`` itself.
    Clean profiles resolve to width 1 — the plan degrades to a plain two-level
    rollup and the second phase is a near-no-op, so auto never pays salting
    the data didn't ask for. Outputs are identical for every width (the merge
    is algebraic); the decided width is recorded on the returned DataFrame as
    ``salt_width`` — a driver-side Python attribute on EXACTLY this object
    (any further transformation returns a new DataFrame without it), there
    for tests and call-site logging, not a durable data channel. Callers
    that need the width downstream read it here and carry it themselves —
    baking it in as a literal column would change the output schema of
    every aggregate this function serves."""
    if n_salts == "auto":
        n_salts = recommend_salts(profile or key_skew_profile(df, key),
                                  target_share)
    elif not isinstance(n_salts, int):
        raise ValueError(f"n_salts must be an int or 'auto', got {n_salts!r}")
    salt_src = F.col(salt_from) if salt_from else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(*partial_aggs)
    out = partial.groupBy(key).agg(*merge_aggs)
    out.salt_width = n_salts
    return out


def grouped_map_sorted(
    df: DataFrame,
    group_key: str,
    order_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming per-group map: rows arrive to `fn` sorted by
    (group_key, *order_cols), possibly split across Arrow batches. `fn` maps a
    batch -> output batch; a group split across Arrow batches is handled by
    carrying the previous batch's LAST ROW in `pdf.attrs['carry']` (a dict, or
    None for the first batch), so sequential logic stays exact across the
    boundary without materializing the group."""

    sorted_df = df.repartition(F.col(group_key)).sortWithinPartitions(
        group_key, *order_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = None
        for pdf in batches:
            if pdf.empty:
                continue
            pdf.attrs["carry"] = carry
            out = fn(pdf)
            carry = pdf.iloc[-1].to_dict()
            if out is not None and len(out):
                yield out

    return sorted_df.mapInPandas(run, schema)


def role_alternation_violations(df: DataFrame) -> DataFrame:
    """Per-conversation sequence check (the applyInPandas-class computation
    from the north star, done skew-safely): flag turns where the same
    non-system role speaks twice in a row. Pure vectorized shift-compare
    inside the streaming grouped map — no per-row Python, no whole-group
    materialization."""

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        carry = pdf.attrs.get("carry")
        prev_conv = pdf["conv_id"].shift()
        prev_role = pdf["role"].shift()
        if carry is not None:
            prev_conv.iloc[0] = carry["conv_id"]
            prev_role.iloc[0] = carry["role"]
        bad = pdf["conv_id"].eq(prev_conv) & pdf["role"].eq(prev_role) \
            & (pdf["role"] != "system")
        return pdf.loc[bad, ["conv_id", "turn_idx", "role"]].copy()

    return grouped_map_sorted(
        df.select("conv_id", "turn_idx", "role"),
        "conv_id", ["turn_idx"], check,
        "conv_id string, turn_idx int, role string",
    )
