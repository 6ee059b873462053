#!/usr/bin/env python
"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every `queries()` entry and its `oracle_sql()` twin at the given sf dir,
canonicalizes both sides the way the driver does (columns sorted by name, rows
sorted by all columns), and reports rows/schema/values matches. Queries with
no oracle get a rows-only line. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.array_equal(av.astype("float64").to_numpy(),
                                  bv.astype("float64").to_numpy(), equal_nan=True):
                return False
        else:
            if not av.astype(object).where(pd.notna(av), None).equals(
                    bv.astype(object).where(pd.notna(bv), None)):
                return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .appName("check_oracles")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_green = n_rowsonly = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        cs, co = canon(sdf), canon(odf)
        rows = len(cs) == len(co)
        schema = list(cs.columns) == list(co.columns)
        try:
            vals = values_equal(cs, co)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: canon error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        ok = rows and schema and vals
        n_green += ok
        n_bad += not ok
        msg = "PASS " if ok else "FAIL "
        print(f"{msg} {name}: rows={len(cs)}/{len(co)} schema={schema} "
              f"values={vals} [{dt:.1f}s]")
        if not ok and len(cs) and len(co):
            print("  spark:", cs.head(3).to_dict("records"))
            print("  oracle:", co.head(3).to_dict("records"))
    print(f"== green={n_green} rows_only={n_rowsonly} bad={n_bad}")
    spark.stop()


if __name__ == "__main__":
    main()
