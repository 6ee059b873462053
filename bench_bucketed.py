#!/usr/bin/env python
"""Measured evidence for the bucketed repeated-run lane (SCALE.md).

Same validation job (full constraint suite, ValidationRunner full mode) over
the same corpus stored two ways:

 * plain parquet — every run pays the key-width uniqueness shuffle;
 * bucketed by conv_id (write_bucketed) — the ingest write pays that shuffle
   ONCE; every run's keyed/conv aggregates then read the layout exchange-free.

Run on TWO corpora: the default skewed one (hot conversation = 30% of rows —
the documented worst case for bucketing, which co-locates it in one task) and
a mild one (hot_frac=0) — so the lane's win AND its caveat are both numbers,
not prose. Writes BENCH/bucketed_lane.md and prints one JSON line.

Env: SPARK_GRAFT_BUCKET_TURNS (default 80M), SPARK_GRAFT_BUCKET_CPUS (32).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

N_TURNS = int(os.environ.get("SPARK_GRAFT_BUCKET_TURNS", "80000000"))
CPUS = os.environ.get("SPARK_GRAFT_BUCKET_CPUS", "32")
N_BUCKETS = 64


def main() -> None:
    from bench import build_session, _force
    from owl2jsonschema_js_spark.compile import compile_spec
    from owl2jsonschema_js_spark.datagen import (gen_transcripts_spark,
                                                 tool_catalog_spark)
    from owl2jsonschema_js_spark.docs import transcript_constraints
    from owl2jsonschema_js_spark.plans import count_exchanges
    from owl2jsonschema_js_spark.runner import ValidationRunner
    from owl2jsonschema_js_spark.sources.tableio import (read_bucketed,
                                                         write_bucketed)
    from owl2jsonschema_js_spark.spec import ConstraintSpec

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cat = tool_catalog_spark(spark)
    base = tempfile.mkdtemp(prefix="bucket_bench_")
    out: dict = {"n_turns": N_TURNS, "cpus": int(CPUS),
                 "n_buckets": N_BUCKETS, "corpora": {}}

    def timed_runs(df, plan, n=3):
        runner = ValidationRunner(plan, n_parts=64)
        _force(runner.run(df, catalog=cat).verdicts)  # warmup
        times = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            res = runner.run(df, catalog=cat)
            _force(res.verdicts)
            res.unpersist()
            times.append(time.perf_counter() - t0)
        return times

    for label, hot in (("skewed_hot30", 0.30), ("mild_hot0", 0.0)):
        src = gen_transcripts_spark(spark, n_rows=N_TURNS,
                                    n_convs=max(1000, N_TURNS // 200),
                                    hot_frac=hot)
        plain = os.path.join(base, label + ".parquet")
        src.write.mode("overwrite").parquet(plain)
        pdf = spark.read.parquet(plain)
        plan = compile_spec(
            ConstraintSpec.parse(transcript_constraints()), pdf.schema)

        t0 = time.perf_counter()
        # on_hot='ignore': this bench exists to measure BOTH sides of the
        # trade the guard enforces, including the hot-30% corpus the guard
        # would (correctly) warn about
        write_bucketed(pdf, "bench_bucketed_" + label, n_buckets=N_BUCKETS,
                       path=os.path.join(base, label + "_bucketed"),
                       on_hot="ignore")
        ingest = time.perf_counter() - t0
        bdf = read_bucketed(spark, "bench_bucketed_" + label)

        # the structural claim, checked in the same session that measures it
        keyed = bdf.groupBy("conv_id", "turn_idx").count()
        assert count_exchanges(keyed) == 0, "bucketed keyed agg must not shuffle"
        assert count_exchanges(pdf.groupBy("conv_id", "turn_idx").count()) > 0

        tp = timed_runs(pdf, plan)
        tb = timed_runs(bdf, plan)
        out["corpora"][label] = {
            "plain_sec": round(min(tp), 2), "plain_all": [round(x, 2) for x in tp],
            "bucketed_sec": round(min(tb), 2), "bucketed_all": [round(x, 2) for x in tb],
            "bucketed_ingest_extra_sec": round(ingest, 2),
            "speedup_per_run": round(min(tp) / min(tb), 3),
            "runs_to_amortize_ingest": (
                round(ingest / (min(tp) - min(tb)), 1)
                if min(tp) > min(tb) else None),
        }
        spark.sql("DROP TABLE IF EXISTS bench_bucketed_" + label)
    print(json.dumps(out))

    lines = [
        "# Bucketed repeated-run lane — measured (bench_bucketed.py)\n",
        f"Full validation suite, {N_TURNS:,} turns, local[{CPUS}], "
        f"{N_BUCKETS} buckets; best-of-3 after warmup, cache cleared "
        "between runs. 'ingest extra' is the one-time bucketBy+sortBy write "
        "cost the lane pays so later runs read the layout shuffle-free.\n",
        "| corpus | plain run (s) | bucketed run (s) | speedup/run | "
        "ingest extra (s) | runs to amortize |",
        "|---|---|---|---|---|---|",
    ]
    for label, r in out["corpora"].items():
        lines.append(
            f"| {label} | {r['plain_sec']} | {r['bucketed_sec']} | "
            f"{r['speedup_per_run']}x | {r['bucketed_ingest_extra_sec']} | "
            f"{r['runs_to_amortize_ingest']} |")
    lines += [
        "",
        "Reading: the mild corpus shows the lane's steady-state win (no key",
        "shuffle per run); the hot-30% corpus shows the documented caveat —",
        "bucketing concentrates the hot conversation in one task (visible as",
        "a (63+1)/64 straggler stage), while the plain lane's full-key hash",
        "spreads it by turn_idx. Choose per corpus with",
        "skew.key_skew_profile; at 10^12 rows the plain lane's per-run",
        "shuffle is ~24 TB over the network, which weighs the trade further",
        "toward bucketing for repeatedly-validated snapshots. Wall-clock on",
        "this host swings 2-3x with contention (see BENCH/BASELINE.md);",
        "best-of-3 is reported, full triplets in the JSON line.",
        "",
    ]
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH", "bucketed_lane.md"), "w") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
