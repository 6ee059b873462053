#!/usr/bin/env python
"""End-to-end demo — the engine analog of the reference's golden demo run
(`node demo` over the DBpedia ontology, /root/reference/demo/index.js).

Generates a seeded transcripts table with injected violations, compiles the
flagship draft-4 constraint doc, validates, profiles, and reports drift vs a
baseline profile — printing each artifact. Run: `python demo.py`.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from owl2jsonschema_js_spark import ConstraintSpec, ValidationRunner, compile_spec
from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
from owl2jsonschema_js_spark.docs import transcript_constraints
from owl2jsonschema_js_spark.drift import baseline_profile, drift_report
from owl2jsonschema_js_spark.order import turn_gaps
from owl2jsonschema_js_spark.stats import profile


def main() -> None:
    spark = (SparkSession.builder.master("local[4]")
             .appName("owl2jsonschema_js_spark-demo")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    fx = gen_transcripts_pandas(n_convs=40, seed=42)
    df = fx.to_spark(spark)
    print(f"== transcripts: {df.count()} turns, "
          f"{df.select('conv_id').distinct().count()} conversations "
          "(seeded, violations injected)")

    doc = transcript_constraints()
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    print(f"== compiled {len(plan.row_rules)} row rules + table constraints "
          f"from {doc['id']} (constraint version {plan.spec.version})")

    res = ValidationRunner(plan, n_parts=4).run(df, catalog=fx.catalog_spark(spark))
    print("== violations"); res.violations.orderBy("rule_id", "conv_id").show(20, False)
    print("== per-partition verdicts")
    print(json.dumps(res.collect_verdicts(), indent=1, sort_keys=True))

    print("== single-pass column profile (text, role)")
    prof = profile(res.checked.select("part", "text", "role"), ["text", "role"])
    prof.select("part", "column", "n", "nulls", "n_distinct").orderBy("part", "column").show(8)

    base = baseline_profile(df, turn_gaps(df))
    rep = drift_report(base, base)  # self vs self -> no drift
    print("== drift vs checkpointed baseline (self-check):",
          "drifted" if rep["drifted"] else "clean")

    expected = {k: v for k, v in fx.expected_counts().items() if v > 0}
    detected = {r["rule_id"]: r["n"] for r in
                res.violations.groupBy("rule_id").count()
                .withColumnRenamed("count", "n").collect()}
    assert detected == expected, (detected, expected)
    print("== detected == injected:", json.dumps(detected, sort_keys=True))

    # the reference-user flow: a set of per-class schema docs linked by
    # allOf:[{$ref:'<Supertype>.json'}] (the reference's OUTPUT layout),
    # validated as the transitive AND of the chain (merge_ancestors, C13/J4)
    docs = {
        "Turn.json": {"id": "Turn.json", "type": "object",
                      "required": ["text"],
                      "properties": {"role": {"enum": ["user", "assistant",
                                                       "system", "tool"]}}},
        "ToolTurn.json": {"id": "ToolTurn.json", "type": "object",
                          "allOf": [{"$ref": "Turn.json"}],
                          "properties": {"turn_idx": {"minimum": 0}}},
    }
    spec2 = ConstraintSpec.merge_ancestors("ToolTurn.json", docs)
    res2 = ValidationRunner(compile_spec(spec2, df.schema), n_parts=4).run(df)
    inh = {r["rule_id"]: r["n"] for r in
           res2.violations.groupBy("rule_id").count()
           .withColumnRenamed("count", "n").collect()}
    print("== inherited-chain validation (ToolTurn <- Turn):",
          json.dumps(inh, sort_keys=True),
          f"[ancestors: {spec2.doc['x-ancestors']}]")
    spark.stop()


if __name__ == "__main__":
    main()
