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
        if "/" not in self.path_or_table and iceberg_available(self.spark):
            return "iceberg"
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
        if self._resolved_fmt() == "iceberg":
            row = self.spark.sql(
                f"SELECT snapshot_id FROM {self.path_or_table}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1").first()
            return str(row["snapshot_id"]) if row else "empty"
        return parquet_snapshot_id(self.path_or_table)

    def read(self, snapshot_id: str | None = None) -> DataFrame:
        fmt = self._resolved_fmt()
        if fmt == "iceberg":
            r = self.spark.read.format("iceberg")
            if snapshot_id:
                r = r.option("snapshot-id", snapshot_id)
            return r.load(self.path_or_table)
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
