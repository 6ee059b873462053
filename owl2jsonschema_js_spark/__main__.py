"""spark-submit entry point (north rule: "launched via spark-submit
--py-files at N and 4N executors").

    zip -r engine.zip owl2jsonschema_js_spark
    spark-submit --py-files engine.zip -m owl2jsonschema_js_spark ...   # or:
    spark-submit --py-files engine.zip run_validate.py ...

Usage:
    python -m owl2jsonschema_js_spark \
        --input /path/transcripts.parquet \
        --constraints constraint_doc.json \
        [--root Child.json] \
        [--catalog /path/tool_catalog.parquet] \
        [--output /path/outdir] [--manifest /path/manifest.json] \
        [--n-parts 64]

Reads the table (Iceberg if available, else parquet), validates resumably
against the manifest, writes violations parquet + canonical verdicts JSON.

``--constraints`` accepts either one draft-4 JSON doc, or a DIRECTORY of
per-class docs — the reference's file-per-schema OUTPUT layout
(lib/index.js:763-788) — in which case ``--root`` names the class to
validate as and its ``allOf:[{$ref:'<Supertype>.json'}]`` ancestor chain is
merged transitively (ConstraintSpec.merge_ancestors, C13/J4).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="owl2jsonschema_js_spark")
    ap.add_argument("--input", required=True)
    ap.add_argument("--constraints", required=True,
                    help="draft-4 JSON doc path, or a directory of per-class docs")
    ap.add_argument("--root", default=None,
                    help="with a --constraints directory: the class doc to "
                         "validate as (ancestors merged transitively)")
    ap.add_argument("--catalog", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--n-parts", type=int, default=64)
    args = ap.parse_args(argv)

    from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator
    from owl2jsonschema_js_spark.compile import compile_spec
    from owl2jsonschema_js_spark.runner import ValidationRunner
    from owl2jsonschema_js_spark.sources import TableIO
    from owl2jsonschema_js_spark.spec import ConstraintSpec

    spark = SparkSession.builder.appName("owl2jsonschema_js_spark-validate").getOrCreate()
    tio = TableIO(spark, args.input)
    snapshot = tio.snapshot_id()
    df = tio.read()

    import os

    if os.path.isdir(args.constraints):
        if not args.root:
            ap.error("--constraints is a directory: pass --root <Class>.json")
        docs: dict[str, dict] = {}
        for name in sorted(os.listdir(args.constraints)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(args.constraints, name)) as f:
                doc = json.load(f)
            if not isinstance(doc, dict):
                ap.error(f"{name}: constraint doc must be a JSON object, "
                         f"got {type(doc).__name__}")
            for key in {doc.get("id", name), name}:
                if key in docs and docs[key] is not doc \
                        and docs[key] != doc:
                    ap.error(f"schema id/name collision on {key!r} "
                             f"(while loading {name}) — ids must be unique "
                             "across the constraints directory")
                docs[key] = doc
        spec = ConstraintSpec.merge_ancestors(args.root, docs)
    else:
        with open(args.constraints) as f:
            spec = ConstraintSpec.parse(json.load(f))
    plan = compile_spec(spec, df.schema)
    for issue in plan.schema_issues:
        print(f"schema issue: {issue}", file=sys.stderr)

    catalog = spark.read.parquet(args.catalog) if args.catalog else None

    if args.manifest:
        manifest = Manifest.load(args.manifest)
        rv = ResumableValidator(plan, manifest, snapshot, n_parts=args.n_parts)
        verdicts = rv.run(df, catalog=catalog)
        if args.output:
            runner = rv.runner
            res = runner.run(runner._with_partition(df), catalog=catalog)
            res.violations.write.mode("overwrite").parquet(args.output + "/violations")
    else:
        runner = ValidationRunner(plan, n_parts=args.n_parts)
        res = runner.run(df, catalog=catalog)
        verdicts = res.collect_verdicts()
        if args.output:
            res.violations.write.mode("overwrite").parquet(args.output + "/violations")

    blob = json.dumps({"snapshot_id": snapshot,
                       "constraint_version": spec.version,
                       "verdicts": verdicts}, sort_keys=True, indent=1)
    if args.output:
        with open(args.output + "/verdicts.json", "w") as f:
            f.write(blob)
    print(blob)
    return 0


if __name__ == "__main__":
    sys.exit(main())
