"""Golden end-to-end files (FIXTURES.md F6): canonical verdicts/profile JSON
checked in; the engine must reproduce them byte-for-byte (sorted-keys JSON —
the reference's deterministic-serializer posture, lib/pretty-json.js:36-38).

Regenerate (after an intentional semantic change):
    python -m tests.test_goldens --regen
"""

import json
import os

from pyspark.sql import functions as F

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _compute_verdicts(spark):
    from owl2jsonschema_js_spark.compile import compile_spec
    from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
    from owl2jsonschema_js_spark.docs import transcript_constraints
    from owl2jsonschema_js_spark.runner import ValidationRunner
    from owl2jsonschema_js_spark.spec import ConstraintSpec

    fx = gen_transcripts_pandas(n_convs=40, seed=123)
    df = fx.to_spark(spark)
    plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)
    res = ValidationRunner(plan, n_parts=8).run(df, catalog=fx.catalog_spark(spark))
    verdicts = res.collect_verdicts()
    violations = sorted(
        (r["part"], r["rule_id"], r["conv_id"],
         -1 if r["turn_idx"] is None else r["turn_idx"], r["observed"])
        for r in res.violations.collect())
    return {"verdicts": verdicts, "violations": violations,
            "constraint_version": plan.spec.version}


def _compute_profile(spark):
    from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
    from owl2jsonschema_js_spark.stats import profile

    fx = gen_transcripts_pandas(n_convs=20, seed=123)
    df = fx.to_spark(spark).withColumn(
        "part", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int"))
    rows = profile(df, columns=["text", "turn_idx", "role"]).collect()
    return {
        f"{r['part']}|{r['column']}": {
            "n": r["n"], "nulls": r["nulls"], "n_distinct": r["n_distinct"],
            "min_num": r["min_num"], "max_num": r["max_num"],
            "min_str": r["min_str"], "max_str": r["max_str"],
            "sum_len": r["sum_len"], "len_hist": r["len_hist"],
        }
        for r in rows
    }


def _canon(obj) -> str:
    return json.dumps(obj, sort_keys=True, indent=1)


def test_golden_verdicts(spark):
    with open(os.path.join(GOLDEN_DIR, "expected_verdicts.json")) as f:
        expected = f.read()
    assert _canon(_compute_verdicts(spark)) == expected


def test_golden_profile(spark):
    with open(os.path.join(GOLDEN_DIR, "expected_profile.json")) as f:
        expected = f.read()
    assert _canon(_compute_profile(spark)) == expected


if __name__ == "__main__":
    import sys

    from pyspark.sql import SparkSession

    if "--regen" in sys.argv:
        s = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(os.path.join(GOLDEN_DIR, "expected_verdicts.json"), "w") as f:
            f.write(_canon(_compute_verdicts(s)))
        with open(os.path.join(GOLDEN_DIR, "expected_profile.json"), "w") as f:
            f.write(_canon(_compute_profile(s)))
        print("goldens regenerated")
