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
    ap.add_argument("--constraints", default=None,
                    help="draft-4 JSON doc path, or a directory of per-class docs")
    ap.add_argument("--suggest", metavar="OUT_JSON", default=None,
                    help="bootstrap mode: instead of validating, profile the "
                         "input and write a suggested draft-4 constraint doc "
                         "(suggest.suggest_constraints) to OUT_JSON — the "
                         "file --constraints accepts on the next run")
    ap.add_argument("--suggest-columns", default=None,
                    help="with --suggest: comma list of columns (default all)")
    ap.add_argument("--enum-max", type=int, default=20,
                    help="with --suggest: enum proposal cardinality cap")
    ap.add_argument("--root", default=None,
                    help="with a --constraints directory: the class doc to "
                         "validate as (ancestors merged transitively)")
    ap.add_argument("--catalog", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--n-parts", type=int, default=64)
    ap.add_argument("--key-cols", default=None,
                    help="the two DISTINCT row-identity columns violations "
                         "key on (group key first; default conv_id,turn_idx); "
                         "for a single-key table pass the key plus any second "
                         "column (uniqueness is then over the pair, implied "
                         "by the key alone). With --suggest: also proposes "
                         "observed table rules (uniqueItems/contiguous/"
                         "cardinality) over this key")
    ap.add_argument("--part-col", default="part",
                    help="partition column; derived from the first key "
                         "column's hash when absent from the input")
    args = ap.parse_args(argv)

    from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator
    from owl2jsonschema_js_spark.compile import compile_spec
    from owl2jsonschema_js_spark.runner import ValidationRunner
    from owl2jsonschema_js_spark.sources import TableIO
    from owl2jsonschema_js_spark.spec import ConstraintSpec

    if (args.constraints is None) == (args.suggest is None):
        ap.error("pass exactly one of --constraints (validate) / "
                 "--suggest OUT_JSON (bootstrap a constraint doc)")

    spark = SparkSession.builder.appName("owl2jsonschema_js_spark-validate").getOrCreate()
    tio = TableIO(spark, args.input)
    snapshot = tio.snapshot_id()
    df = tio.read()

    def parse_key_cols(required: bool):
        """(k0, k1) or None. An EXPLICIT --key-cols must resolve (missing
        columns error); the default pair applies only where present —
        suggest mode silently skips table rules on tables without it."""
        raw = args.key_cols or "conv_id,turn_idx"
        kc = tuple(c for c in raw.split(",") if c)
        if len(kc) != 2 or kc[0] == kc[1]:
            ap.error("--key-cols wants exactly two DISTINCT column names, "
                     f"got {raw!r}")
        missing = [c for c in kc if c not in df.columns]
        if missing:
            if args.key_cols or required:
                ap.error(f"--key-cols not in input: {missing}")
            return None
        return kc

    if args.suggest:
        from owl2jsonschema_js_spark.suggest import suggest_constraints
        cols = ([c for c in args.suggest_columns.split(",") if c]
                if args.suggest_columns else None)
        doc = suggest_constraints(df, columns=cols, enum_max=args.enum_max,
                                  key_cols=parse_key_cols(required=False))
        doc["x-suggested-from"]["snapshot_id"] = snapshot
        blob = json.dumps(doc, sort_keys=True, indent=1)
        with open(args.suggest, "w") as f:
            f.write(blob)
        print(blob)
        return 0

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

    key_cols = parse_key_cols(required=True)

    if args.manifest:
        manifest = Manifest.load(args.manifest)
        rv = ResumableValidator(plan, manifest, snapshot, n_parts=args.n_parts,
                                part_col=args.part_col, key_cols=key_cols)
        verdicts = rv.run(df, catalog=catalog)
        if args.output:
            runner = rv.runner
            res = runner.run(runner._with_partition(df), catalog=catalog)
            res.violations.write.mode("overwrite").parquet(args.output + "/violations")
    else:
        runner = ValidationRunner(plan, n_parts=args.n_parts,
                                  part_col=args.part_col, key_cols=key_cols)
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
