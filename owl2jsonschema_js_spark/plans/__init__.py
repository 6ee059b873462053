"""Physical-plan inspection helpers: assert the plan we want, not just the
answer we want (pushdown reached the scan, codegen fused the rules, no stray
exchanges)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may collapse some
    at runtime; this is the static count)."""
    return len(re.findall(r"\bExchange\b(?! SinglePartition)", explain_str(df, "simple")))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions `fragment`."""
    s = explain_str(df, "formatted")
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", s)
    return any(fragment in grp for grp in m)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read by the scan (column pruning check)."""
    s = explain_str(df, "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", s)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))
