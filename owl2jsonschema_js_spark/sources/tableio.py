"""Table layer abstraction: Iceberg when the runtime jar is present, plain
partitioned parquet otherwise (SURVEY.md §7 milestone-0 note — no Iceberg jar
in this sandbox).

The engine's checkpoint manifest is keyed on a snapshot id either way:
 * Iceberg: the table's real snapshot-id, pinned at read time
   (``option('snapshot-id', ...)``) so a resumed run revalidates the same data
   the interrupted run saw (S1 analog: the reference pins a base URL before
   parsing, lib/index.js:276-277).
 * parquet: a content hash of the file listing (checkpoint.parquet_snapshot_id).

Writes: violations/verdicts append to a table (`writeTo(...).append()` on
Iceberg, partitioned parquet append otherwise) — the engine analog of the
reference's file-per-schema sink (S7, lib/index.js:763-788).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from owl2jsonschema_js_spark.checkpoint import parquet_snapshot_id


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


_EXT_FORMATS = {".parquet": "parquet", ".orc": "orc", ".json": "json",
                ".jsonl": "json", ".csv": "csv"}


@dataclass
class TableIO:
    spark: SparkSession
    path_or_table: str
    fmt: str = "auto"  # auto | parquet | orc | json | csv | iceberg

    def _resolved_fmt(self) -> str:
        """Content-type dispatch, the engine analog of the reference's
        extension/header format sniffing (S4: getType lib/index.js:308-346,
        extensionType lib/index.js:75-94): catalog identifiers go to Iceberg
        when the runtime is present; paths dispatch on extension — of the path
        itself, or of the data files inside a directory — defaulting to
        parquet."""
        if self.fmt != "auto":
            return self.fmt
        if "/" not in self.path_or_table:
            if iceberg_available(self.spark):
                return "iceberg"
            # catalog identifier without the Iceberg runtime: a session-catalog
            # table (e.g. the bucketed repeated-run lane from write_bucketed —
            # reading its files directly would drop the bucketing spec and
            # silently reintroduce the shuffles the lane exists to elide)
            if self.spark.catalog.tableExists(self.path_or_table):
                return "table"
        import os

        path = self.path_or_table
        if path.startswith("file://"):
            path = path[len("file://"):]  # local after all — sniff normally
        elif "://" in path:
            # URI paths (hdfs://, s3a://, ...): extension sniffing of
            # DIRECTORY CONTENTS below is local-filesystem-only — a remote
            # json/csv directory would silently fall through to the parquet
            # default. Dispatch on the path's own extension or demand an
            # explicit fmt.
            for ext, fmt in _EXT_FORMATS.items():
                if path.endswith(ext):
                    return fmt
            raise ValueError(
                f"cannot sniff format of URI path {self.path_or_table!r}: "
                "directory-content sniffing is local-only — pass fmt='parquet' "
                "(or the actual format) explicitly")
        candidates = [path]
        if os.path.isdir(path):
            candidates += [n for n in sorted(os.listdir(path))
                           if not n.startswith(("_", "."))]
        for name in candidates:
            for ext, fmt in _EXT_FORMATS.items():
                if name.endswith(ext):
                    return fmt
        return "parquet"

    def snapshot_id(self) -> str:
        fmt = self._resolved_fmt()
        if fmt == "iceberg":
            row = self.spark.sql(
                f"SELECT snapshot_id FROM {self.path_or_table}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1").first()
            return str(row["snapshot_id"]) if row else "empty"
        if fmt == "table":
            # content-hash of the table's file listing, same contract as the
            # plain-parquet emulation (resume keys stay stable across layouts)
            row = (self.spark.sql(f"DESCRIBE TABLE EXTENDED {self.path_or_table}")
                   .where("col_name = 'Location'").first())
            if row is None or not row["data_type"]:
                # catalog.tableExists also matches temp views, which have no
                # Location and therefore no file listing to hash
                raise ValueError(
                    f"snapshot ids require a location-backed table; "
                    f"{self.path_or_table!r} resolves to a view or "
                    "location-less catalog entry (read() still works — only "
                    "checkpoint/resume needs a snapshot id)")
            return parquet_snapshot_id(row["data_type"].removeprefix("file:"))
        return parquet_snapshot_id(self.path_or_table)

    def read(self, snapshot_id: str | None = None) -> DataFrame:
        fmt = self._resolved_fmt()
        if fmt == "iceberg":
            r = self.spark.read.format("iceberg")
            if snapshot_id:
                r = r.option("snapshot-id", snapshot_id)
            return r.load(self.path_or_table)
        if fmt == "table":
            return self.spark.table(self.path_or_table)
        reader = self.spark.read
        if fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        return reader.format(fmt).load(self.path_or_table)

    def append(self, df: DataFrame, target: str, partition_by: tuple[str, ...] = ()) -> None:
        if self._resolved_fmt() == "iceberg":
            df.writeTo(target).append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    bucket_col: str = "conv_id",
    sort_col: str = "turn_idx",
    path: str | None = None,
    fmt: str = "parquet",
    profile: dict | None = None,
    max_hot_share: float = 0.10,
    on_hot: str = "warn",
) -> None:
    """Materialize the transcripts table BUCKETED by the conversation key.

    This is the pay-once amortization lane for repeated validation of the same
    snapshot (resume, constraint evolution, drift re-baselining): the ingest
    write pays one hash shuffle on ``bucket_col``, and every later run's
    conversation aggregate AND key-uniqueness groupBy read that layout
    shuffle-free — ``HashPartitioning(conv_id)`` satisfies the clustered
    distribution of both ``groupBy(conv_id)`` and ``groupBy(conv_id,
    turn_idx)`` (grouping keys ⊇ bucket keys), so Catalyst elides the Exchange
    (gated in tests/test_plans.py::test_bucketed_scan_elides_both_validation
    _shuffles). On Iceberg the same layout is declared as a ``bucket(N,
    conv_id)`` partition transform and exploited by storage-partitioned joins.

    Skew caveat, stated honestly: bucketing co-locates each conversation in
    ONE bucket, so a hot conversation (fixtures plant one with ~30% of rows)
    concentrates in a single task, whereas the shuffled full-key groupBy
    spreads it by ``turn_idx``. The bucketed lane therefore wins on repeated
    runs over mildly-skewed data (zero shuffle × k runs); under pathological
    single-conversation skew keep the default shuffled lane — the choice is a
    storage decision, the runner's plan adapts to either automatically.

    That caveat is now ENFORCED, not just documented (SURVEY §4.2,
    observe->decide): before writing, the bucket key's skew is measured with
    :func:`~owl2jsonschema_js_spark.skew.key_skew_profile` (one key-width
    scan — marginal next to the full-row shuffle+write this function pays
    anyway; pass a stored ``profile`` to skip it). A hot key whose share
    exceeds ``max_hot_share`` triggers ``on_hot``: ``'warn'`` (default —
    UserWarning naming the key, its share, and the measured 0.41x per-run
    regression bench_bucketed.py recorded at share 0.30), ``'raise'``
    (ValueError, for pipelines that would rather fail ingest than ship a
    straggler layout), or ``'ignore'`` (deliberate override, e.g. the bench
    measuring both sides of the trade). The 0.10 default sits between the
    measured-good uniform corpus (1.28x faster/run) and the measured-bad
    hot-30% corpus (0.41x), ~3x the ideal 1/32 bucket share.
    """
    if on_hot not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_hot must be 'warn'|'raise'|'ignore', got {on_hot!r}")
    if on_hot != "ignore":
        from owl2jsonschema_js_spark.skew import key_skew_profile

        prof = profile or key_skew_profile(df, bucket_col, top_n=1)
        if prof["max_share"] > max_hot_share:
            if prof.get("top"):
                hot_key, hot_n, hot_share = prof["top"][0]
                hot_desc = (f"hot key {hot_key!r} ({hot_n:,} rows, "
                            f"{hot_share:.1%} of the table)")
            else:
                # stored/hand-assembled profiles may carry max_share without
                # the top list — the guard still fires, just keylessly
                hot_desc = (f"a hot key holding {prof['max_share']:.1%} "
                            "of the table (profile carries no top list)")
            msg = (
                f"bucketing {table!r} by {bucket_col!r} concentrates "
                f"{hot_desc}, "
                f"> max_hot_share={max_hot_share:.0%}, into one task per run; "
                "bench_bucketed.py measured 0.41x per-run at share 0.30 — "
                "keep the shuffled lane for this corpus, or pass "
                "on_hot='ignore' to accept the straggler")
            if on_hot == "raise":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, UserWarning, stacklevel=2)
    # repartition onto the bucket hash first: without it a bucketed write
    # emits (input partitions × n_buckets) files (each task writes every
    # bucket it holds rows for), and the bucketed SCAN — which may not split
    # or coalesce files — then pays per-file open cost on thousands of
    # fragments. Spark's repartition and bucket-id hashes agree (both
    # Murmur3-based HashPartitioning), so this yields ~one file per bucket.
    w = (df.repartition(n_buckets, bucket_col)
         .write.mode("overwrite").format(fmt)
         .bucketBy(n_buckets, bucket_col).sortBy(sort_col))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back. Bucket metadata lives in the session
    catalog (in-memory catalog here; Hive metastore or an Iceberg catalog on
    a real cluster), so reads must go through ``spark.table`` — a raw
    ``read.parquet(path)`` of the same files loses the bucketing spec and
    silently reintroduces the shuffles."""
    return spark.table(table)
