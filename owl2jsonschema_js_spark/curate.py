"""spark-submit entry point for the curation lanes — the pipeline steps a
corpus owner runs beside validation:

    python -m owl2jsonschema_js_spark.curate <cmd> --input docs.parquet --output out [...]

Commands
--------
dedup          MinHash-LSH near-dup survivors (one doc kept per cluster)
substring      maximal cross-doc repeated byte spans >= --min-len
decontaminate  n-gram overlap vs --eval set (add --min-len for exact spans)
pii            per-doc PII counts; --redact writes the scrubbed corpus
sample         deterministic LCG sample; --rate, --rates src0=0.5,src1=0.1,
               or --k N (exactly N per stratum; --no-strata for N total)
pack           token-budget shard assignment (exact global cumsum)
split          leakage-safe train/test split (near-dup clusters move as units)
ann-build      create/grow a persisted IVF index (--index root; --grow appends)
ann-query      batched top-k over a persisted IVF index (--queries parquet;
               output rows carry query_<id-col> = the query's real id)
profile        mergeable HLL distinct-count profile of --columns into a
               profile store (--epoch slots increments; re-running an epoch
               rewrites it — counts never double; the store is the same
               batch_id-partition layout the streaming monitor writes, so
               profile_stream.read_profile reads both)

Every command reads parquet via TableIO (Iceberg when the runtime jar is
present), writes parquet to --output, and prints one JSON summary line.
Like the validation CLI, ship the package with
``spark-submit --py-files engine.zip``."""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _rates(spec: str) -> dict[str, float]:
    out = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not _ or not k:
            raise argparse.ArgumentTypeError(
                f"--rates wants src=rate[,src=rate...], got {spec!r}")
        out[k] = float(v)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="owl2jsonschema_js_spark.curate")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--input", required=True)
        p.add_argument("--output", required=True)
        p.add_argument("--id-col", default="doc_id")
        p.add_argument("--text-col", default="text")

    p = sub.add_parser("dedup"); common(p)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--keep-longest", action="store_true",
                   help="survivor policy: keep each cluster's longest text "
                        "(byte length; ties by largest id) instead of the "
                        "min-id representative")

    p = sub.add_parser("substring"); common(p)
    p.add_argument("--min-len", type=int, default=50)
    p.add_argument("--min-coverage", type=float, default=0.0,
                   help="> 0: write span-coverage dedup SURVIVORS instead "
                        "of the raw span table")

    p = sub.add_parser("decontaminate"); common(p)
    p.add_argument("--eval", dest="eval_path", required=True)
    p.add_argument("--eval-id-col", default="eval_id")
    p.add_argument("--ngram", type=int, default=5)
    p.add_argument("--min-len", type=int, default=0,
                   help="> 0: exact span mode instead of n-gram counting")

    p = sub.add_parser("pii"); common(p)
    p.add_argument("--redact", action="store_true")

    p = sub.add_parser("sample"); common(p)
    p.add_argument("--rate", type=float, default=None)
    p.add_argument("--rates", type=_rates, default=None)
    p.add_argument("--k", type=int, default=None,
                   help="exact-count mode: keep exactly K rows per "
                        "--stratum-col (or K total with --no-strata) "
                        "instead of a rate")
    p.add_argument("--no-strata", action="store_true",
                   help="with --k: one global draw instead of per-stratum")
    p.add_argument("--stratum-col", default="source")
    p.add_argument("--salt", type=int, default=0)

    p = sub.add_parser("pack"); common(p)
    p.add_argument("--budget", type=int, required=True)

    p = sub.add_parser("split"); common(p)
    p.add_argument("--test-frac", type=float, default=0.1)
    p.add_argument("--threshold", type=float, default=0.7,
                   help="MinHash-LSH near-dup threshold for the pair lane "
                        "the split clusters over")
    p.add_argument("--salt", type=int, default=0)

    p = sub.add_parser("ann-build")
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True, help="index root directory")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--n-centroids", type=int, default=16)
    p.add_argument("--train-iters", type=int, default=2)
    p.add_argument("--grow", action="store_true",
                   help="append to an existing index (quantizer frozen) "
                        "instead of (re)building it")

    p = sub.add_parser("profile")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True,
                   help="profile store root (batch_id-partitioned parquet)")
    p.add_argument("--columns", required=True,
                   help="comma-separated columns to profile")
    p.add_argument("--part-col", default="part",
                   help="partition column for per-partition stats; absent "
                        "from the input => one synthetic 'all' partition")
    p.add_argument("--epoch", type=int, default=0,
                   help="this increment's slot in the store; re-running the "
                        "same epoch REWRITES it (idempotent), a new epoch "
                        "merges in as an increment")
    p.add_argument("--drift-against", default=None,
                   help="baseline profile store: add per-column vocabulary "
                        "drift (est_jaccard, new_value_rate) vs it to the "
                        "summary — sketches only, no data rescanned")

    p = sub.add_parser("ann-query")
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True,
                   help="parquet of query vectors (same id/vec columns)")
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--nprobe", type=int, default=4)

    args = ap.parse_args(argv)

    from owl2jsonschema_js_spark.sources import TableIO

    spark = SparkSession.builder.appName(
        f"owl2jsonschema_js_spark-curate-{args.cmd}").getOrCreate()
    in_path = getattr(args, "input", None)  # ann-query reads --queries only
    docs = TableIO(spark, in_path).read() if in_path else None
    n_in = docs.count() if docs is not None else 0

    if args.cmd == "dedup":
        from owl2jsonschema_js_spark.operators.dedup import (dedup_survivors,
                                                             minhash_lsh_pairs)
        pairs = minhash_lsh_pairs(docs, threshold=args.threshold,
                                  id_col=args.id_col,
                                  text_col=args.text_col).persist()
        pr = F.octet_length(args.text_col) if args.keep_longest else None
        out = dedup_survivors(docs, pairs, id_col=args.id_col,
                              priority_col=pr)
        out.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        summary = {"cmd": "dedup", "docs_in": n_in, "survivors": n_out,
                   "dropped": n_in - n_out,
                   "policy": "longest" if args.keep_longest else "min_id"}
        pairs.unpersist()
    elif args.cmd == "substring":
        if args.min_coverage > 0:
            from owl2jsonschema_js_spark.operators.substring import (
                span_dedup_survivors)
            out = span_dedup_survivors(docs, min_len=args.min_len,
                                       min_coverage=args.min_coverage,
                                       id_col=args.id_col,
                                       text_col=args.text_col)
            out.write.mode("overwrite").parquet(args.output)
            n_out = spark.read.parquet(args.output).count()
            summary = {"cmd": "substring", "docs_in": n_in,
                       "survivors": n_out, "dropped": n_in - n_out,
                       "min_coverage": args.min_coverage}
        else:
            from owl2jsonschema_js_spark.operators.substring import substring_dups
            stats: dict = {}
            out = substring_dups(docs, min_len=args.min_len, id_col=args.id_col,
                                 text_col=args.text_col, stats=stats)
            out.write.mode("overwrite").parquet(args.output)
            summary = {"cmd": "substring", "docs_in": n_in,
                       "spans": spark.read.parquet(args.output).count(), **stats}
    elif args.cmd == "decontaminate":
        evals = TableIO(spark, args.eval_path).read()
        if args.min_len > 0:
            from owl2jsonschema_js_spark.operators.substring import substring_dups
            out = substring_dups(docs, min_len=args.min_len,
                                 id_col=args.id_col, text_col=args.text_col,
                                 other=evals, other_id_col=args.eval_id_col,
                                 other_text_col=args.text_col)
        else:
            from owl2jsonschema_js_spark.operators.curation import decontaminate
            out = decontaminate(docs, evals, n=args.ngram, id_col=args.id_col,
                                text_col=args.text_col,
                                eval_id_col=args.eval_id_col,
                                eval_text_col=args.text_col)
        out.write.mode("overwrite").parquet(args.output)
        hits = spark.read.parquet(args.output)
        summary = {"cmd": "decontaminate", "docs_in": n_in,
                   "hit_rows": hits.count(),
                   "contaminated_docs":
                       hits.select(hits.columns[0]).distinct().count()}
    elif args.cmd == "pii":
        from owl2jsonschema_js_spark.operators.curation import (pii_redact,
                                                                pii_scan)
        scan = pii_scan(docs, id_col=args.id_col, text_col=args.text_col)
        if args.redact:
            pii_redact(docs, text_col=args.text_col) \
                .write.mode("overwrite").parquet(args.output)
        else:
            scan.write.mode("overwrite").parquet(args.output)
        agg = scan.agg(F.sum("pii_total").alias("t"),
                       F.sum((F.col("pii_total") > 0).cast("int")).alias("d")
                       ).collect()[0]
        summary = {"cmd": "pii", "docs_in": n_in, "redacted": args.redact,
                   "pii_hits": int(agg["t"] or 0),
                   "docs_with_pii": int(agg["d"] or 0)}
    elif args.cmd == "sample":
        from owl2jsonschema_js_spark.operators.curation import (
            hash_sample, hash_sample_exact_k)
        n_modes = sum(x is not None for x in (args.rate, args.rates, args.k))
        if n_modes != 1:
            ap.error("pass exactly one of --rate / --rates / --k")
        if args.k is not None:
            out = hash_sample_exact_k(
                docs, args.k, key_col=args.id_col,
                stratum_col=None if args.no_strata else args.stratum_col,
                salt=args.salt)
        else:
            rate = args.rate if args.rate is not None else args.rates
            out = hash_sample(docs, rate, key_col=args.id_col,
                              stratum_col=args.stratum_col if args.rates else None,
                              salt=args.salt)
        out.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        summary = {"cmd": "sample", "docs_in": n_in, "kept": n_out,
                   "salt": args.salt}
        if args.k is not None:
            summary["k"] = args.k
    elif args.cmd == "split":
        from owl2jsonschema_js_spark.operators.curation import leakage_safe_split
        from owl2jsonschema_js_spark.operators.dedup import minhash_lsh_pairs
        pairs = minhash_lsh_pairs(docs, threshold=args.threshold,
                                  id_col=args.id_col,
                                  text_col=args.text_col).persist()
        out = leakage_safe_split(docs, pairs, test_frac=args.test_frac,
                                 id_col=args.id_col, salt=args.salt)
        out.write.mode("overwrite").parquet(args.output)
        written = spark.read.parquet(args.output)
        by = {r["split"]: r["n"] for r in
              written.groupBy("split").agg(F.count("*").alias("n")).collect()}
        summary = {"cmd": "split", "docs_in": n_in,
                   "test": by.get("test", 0), "train": by.get("train", 0),
                   "salt": args.salt}
        pairs.unpersist()
    elif args.cmd == "ann-build":
        from owl2jsonschema_js_spark.operators.ivf_store import IvfIndexStore
        store = IvfIndexStore(spark, args.index, n_centroids=args.n_centroids,
                              train_iters=args.train_iters,
                              id_col=args.id_col, vec_col=args.vec_col)
        if args.grow:
            added = store.increment(docs)
            summary = {"cmd": "ann-build", "grow": True,
                       "vectors_in": n_in, "appended": added}
        else:
            store.create(docs)
            st = {k: v for k, v in store.stats().items() if k != "sizes"}
            summary = {"cmd": "ann-build", "grow": False,
                       "vectors_in": n_in, **st}
    elif args.cmd == "profile":
        from owl2jsonschema_js_spark.stats import (sketch_estimates,
                                                   sketch_profile)
        from owl2jsonschema_js_spark.streaming.profile_stream import \
            read_profile
        cols = [c for c in args.columns.split(",") if c]
        missing = [c for c in cols if c not in docs.columns]
        if missing:
            ap.error(f"--columns not in input: {missing}")
        if args.part_col not in docs.columns:
            docs = docs.withColumn(args.part_col, F.lit("all"))
        (sketch_profile(docs, cols, part_col=args.part_col)
         .withColumn("batch_id", F.lit(args.epoch))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(args.output))
        est = {r["column"]: r for r in
               sketch_estimates(read_profile(spark, args.output)).collect()}
        summary = {"cmd": "profile", "rows_in": n_in, "epoch": args.epoch,
                   "columns": {c: {"n": int(v["n"]),
                                   "nulls": int(v["nulls"]),
                                   "distinct_est": int(v["distinct_est"])}
                               for c, v in est.items()}}
        if args.drift_against:
            from owl2jsonschema_js_spark.stats import sketch_vocab_drift
            drift = sketch_vocab_drift(
                read_profile(spark, args.drift_against),
                read_profile(spark, args.output)).collect()
            summary["drift"] = {
                r["column"]: {"est_jaccard": round(r["est_jaccard"], 4),
                              "new_value_rate": round(r["new_value_rate"], 4)}
                for r in drift}
    elif args.cmd == "ann-query":
        from owl2jsonschema_js_spark.operators.ivf_store import IvfIndexStore
        store = IvfIndexStore(spark, args.index,
                              id_col=args.id_col, vec_col=args.vec_col)
        qdf = TableIO(spark, args.queries).read()
        qrows = qdf.orderBy(args.id_col).collect()  # query batches are small
        # ids= labels results with the REAL query ids in the scoring pass —
        # positional query_ids would silently collide with corpus ids
        out = (store.query([r[args.vec_col] for r in qrows],
                           k=args.k, nprobe=args.nprobe,
                           ids=[r[args.id_col] for r in qrows])
               .withColumnRenamed("query_id", f"query_{args.id_col}"))
        out.write.mode("overwrite").parquet(args.output)
        summary = {"cmd": "ann-query", "n_queries": len(qrows), "k": args.k,
                   "nprobe": args.nprobe,
                   "rows": spark.read.parquet(args.output).count()}
    else:  # pack
        from owl2jsonschema_js_spark.operators.curation import pack_shards
        out = pack_shards(docs, budget_tokens=args.budget, id_col=args.id_col)
        out.write.mode("overwrite").parquet(args.output)
        packed = spark.read.parquet(args.output)
        summary = {"cmd": "pack", "docs_in": n_in, "budget": args.budget,
                   "shards": packed.select("shard_id").distinct().count()}

    print(json.dumps(summary, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
