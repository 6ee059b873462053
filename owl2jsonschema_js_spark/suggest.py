"""Constraint bootstrapping: propose a draft-4 constraint doc FROM the data.

The reference compiles an ontology into a schema; a 100 TB operator's first
validation spec usually starts the other way — "what does the corpus
actually look like?". :func:`suggest_constraints` turns one observation pass
into a canonical draft-4 doc the engine's own pipeline accepts verbatim::

    doc  = suggest_constraints(df)                  # observe
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    res  = ValidationRunner(plan).run(df)           # 0 violations, by
                                                    # construction (tested)

Every proposed keyword is an OBSERVED FACT of the profiled data (so
revalidating the same snapshot yields zero violations — the well-formedness
test of the suggester), and becomes a real constraint the moment the corpus
grows: a new enum value, an out-of-range number, or a NULL in a
never-null column in the NEXT increment is exactly the drift a bootstrapped
spec exists to catch. Operators tighten the draft by hand; the suggester's
job is a sound, data-backed starting point, not policy.

Scale shape: ONE aggregate pass over the profiled columns (count / nulls /
min / max / length bounds / approx distinct — all partial-aggregating JVM
expressions), then one bounded ``distinct().limit(enum_max+1)`` per
LOW-CARDINALITY candidate column only (candidates are pre-filtered by the
HLL estimate, so a high-cardinality column never pays a distinct shuffle,
and the collect is capped at enum_max+1 rows regardless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["suggest_constraints"]

# Spark dtype -> draft-4 "type"; dtypes absent here (timestamp, arrays, ...)
# get structural keywords only (required), never a type check
_TYPE_MAP = {
    "tinyint": "integer", "smallint": "integer", "int": "integer",
    "bigint": "integer",
    "float": "number", "double": "number",
    "string": "string", "boolean": "boolean",
}


def suggest_constraints(df: DataFrame, columns: list[str] | None = None,
                        enum_max: int = 20,
                        title: str = "suggested-from-profile",
                        key_cols: tuple[str, str] | None = None) -> dict:
    """One observation pass -> a canonical draft-4 dict (sort-stable,
    JSON-serializable) with, per column and only where observed:

      * ``type``            — from the Spark dtype (scalar dtypes only),
      * ``required``        — columns with zero observed NULLs,
      * ``minimum/maximum`` — observed numeric bounds,
      * ``minLength/maxLength`` — observed string length bounds,
      * ``enum``            — sorted observed values, for string columns
                              whose distinct count is <= ``enum_max``
                              (HLL-prefiltered; the exact check is a
                              bounded ``distinct().limit(enum_max+1)``).

    ``x-suggested-from`` records row count and per-column null counts —
    provenance the spec parser ignores and a reviewer reads.

    ``key_cols=(group, seq)`` additionally proposes the TABLE-scope rules
    the runner evaluates (``x-table-constraints``), each only if observed:
    ``uniqueItems [group, seq]`` when no key repeats, ``contiguous group``
    when every group's seq runs 0..n-1 under the runner's own rule, and
    ``minItems/maxItems {per: group}`` from the observed group-size band.
    Cost: one key-width groupBy (the exact shuffle shape the runner's
    uniqueness pass uses) + two O(1)-row driver aggregates."""
    cols = columns or [c for c in df.columns]
    if not cols:
        raise ValueError("suggest_constraints needs at least one column")
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        t = df.schema[c].dataType.simpleString()
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{i}"))
        if _TYPE_MAP.get(t) in ("integer", "number"):
            aggs.append(F.min(c).alias(f"__min_{i}"))
            aggs.append(F.max(c).alias(f"__max_{i}"))
        elif t == "string":
            aggs.append(F.min(F.length(c)).alias(f"__min_{i}"))
            aggs.append(F.max(F.length(c)).alias(f"__max_{i}"))
            aggs.append(F.approx_count_distinct(c).alias(f"__ad_{i}"))
    row = df.agg(*aggs).first()
    n_rows = int(row["__n"])

    props: dict[str, dict] = {}
    required: list[str] = []
    null_counts: dict[str, int] = {}
    for i, c in enumerate(cols):
        t = df.schema[c].dataType.simpleString()
        sub: dict = {}
        jt = _TYPE_MAP.get(t)
        if jt:
            sub["type"] = jt
        nulls = int(row[f"__nulls_{i}"])
        null_counts[c] = nulls
        if nulls == 0 and n_rows > 0:
            required.append(c)
        if jt in ("integer", "number") and row[f"__min_{i}"] is not None:
            lo, hi = row[f"__min_{i}"], row[f"__max_{i}"]
            sub["minimum"] = int(lo) if jt == "integer" else float(lo)
            sub["maximum"] = int(hi) if jt == "integer" else float(hi)
        elif t == "string" and row[f"__min_{i}"] is not None:
            # approx estimate gates the exact check; 1.2x slack covers the
            # estimator's error band so a true <=enum_max column is never
            # skipped, and the exact limit(enum_max+1) rejects false admits
            if int(row[f"__ad_{i}"]) <= enum_max * 1.2 + 2:
                vals = [r[0] for r in df.select(c).where(F.col(c).isNotNull())
                        .distinct().limit(enum_max + 1).collect()]
                if len(vals) <= enum_max:
                    sub["enum"] = sorted(vals)
            if "enum" not in sub:
                sub["minLength"] = int(row[f"__min_{i}"])
                sub["maxLength"] = int(row[f"__max_{i}"])
        if sub:
            props[c] = sub
    doc = {
        "title": title,
        "type": "object",
        "properties": props,
        "required": sorted(required),
        "x-suggested-from": {"n_rows": n_rows, "null_counts": null_counts},
    }
    if key_cols and n_rows:
        k0, k1 = key_cols
        # contiguity (seq runs 0..n-1) is only meaningful — and only
        # type-checks — for an integral sequence column; a string second key
        # still gets uniqueness + the group-size band
        seq_integral = df.schema[k1].dataType.simpleString() in (
            "tinyint", "smallint", "int", "bigint")
        keyed = df.groupBy(k0, k1).agg(F.count(F.lit(1)).alias("__c"))
        kmax = int(keyed.agg(F.max("__c")).first()[0])
        gaggs = [F.sum("__c").alias("__n")]
        if seq_integral:
            gaggs += [F.count(k1).alias("__nd"),
                      F.min(k1).alias("__mn"), F.max(k1).alias("__mx")]
        grp = keyed.groupBy(k0).agg(*gaggs)
        saggs = [F.min("__n").alias("lo"), F.max("__n").alias("hi")]
        if seq_integral:
            saggs.append(
                F.max(F.when((F.col("__mn") != 0)
                             | (F.col("__mx") != F.col("__nd") - 1), 1)
                      .otherwise(0)).alias("bad_contig"))
        srow = grp.agg(*saggs).first()
        tc: dict = {"minItems": {"per": k0, "value": int(srow["lo"])},
                    "maxItems": {"per": k0, "value": int(srow["hi"])}}
        if kmax == 1:
            tc["uniqueItems"] = [k0, k1]
        if seq_integral and int(srow["bad_contig"] or 0) == 0:
            tc["contiguous"] = k0
        doc["x-table-constraints"] = tc
    return doc
