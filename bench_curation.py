#!/usr/bin/env python
"""Standalone bench for the round-4 curation lanes at $SPARK_GRAFT_SF_DIR
(default sf0.1) — kept OUT of bench.py's graded suite so the headline
composition stays comparable to the curated records; results append-recorded
in BENCH/curation.md. Prints one JSON line like bench.py.

The documents table is small even at sf0.1 (5k docs), so these numbers
measure per-lane fixed cost + plan shape rather than throughput; the scale
posture arguments live in SCALE.md and the plan gates in tests.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("bench-curation")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm scan

    from owl2jsonschema_js_spark.operators.curation import (decontaminate,
                                                            hash_sample,
                                                            pack_shards,
                                                            pii_scan)
    from owl2jsonschema_js_spark.operators.substring import (
        span_dedup_survivors, substring_dups)

    evals = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text")

    def _sketch(d):
        from owl2jsonschema_js_spark.stats import (merge_sketch_profiles,
                                                   sketch_estimates,
                                                   sketch_profile)
        part = d.withColumn("part", F.col("source"))
        base = part.where(F.col("doc_id") % 2 == 0)
        inc = part.where(F.col("doc_id") % 2 == 1)
        return sketch_estimates(merge_sketch_profiles(
            sketch_profile(base, ["lang", "source"]),
            sketch_profile(inc, ["lang", "source"])))

    def timed(fn):
        t0 = time.perf_counter()
        n = fn().count()
        return round(time.perf_counter() - t0, 3), n

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in [
        ("decontaminate", lambda: decontaminate(docs, evals, n=5)
            .where("doc_id != eval_id")),
        ("pii_scan", lambda: pii_scan(docs)),
        ("hash_sample", lambda: hash_sample(docs, 0.1)),
        ("pack_shards", lambda: pack_shards(docs, budget_tokens=2000)),
        ("substring_dups", lambda: substring_dups(docs, min_len=60, k=16)),
        ("span_survivors", lambda: span_dedup_survivors(
            docs, min_len=60, k=16, min_coverage=0.5)),
        ("sketch_profile", lambda: _sketch(docs)),
    ]:
        times[name], rows[name] = timed(fn)

    out = {"metric": "curation lane seconds", "sf_dir": sf_dir,
           "cpus": int(cpus), "docs": docs.count(),
           "queries": times, "rows": rows,
           "value": round(sum(times.values()), 3), "unit": "sec"}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
