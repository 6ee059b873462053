"""Vector column helpers — JVM-side (zip_with/aggregate inside whole-stage
codegen), no Python in the hot path. Elements are cast to double before
accumulation so float32-stored embeddings get double-precision sums."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # nullif: zero-norm vectors yield NULL (not an ANSI divide-by-zero crash);
    # thresholds/top-k then drop them naturally
    return dot(a, b) / F.nullif(l2norm(a) * l2norm(b), F.lit(0.0))
