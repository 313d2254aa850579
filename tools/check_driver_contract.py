"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count, column names, and exact values (columns
sorted by name, rows sorted by all columns — stricter than a hash).

Usage: python tools/check_driver_contract.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if not isinstance(v, (bytes, list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver's gate is a stringified value-hash: Spark
        # DECIMAL→object(Decimal('1.40')) vs DuckDB DECIMAL→float64(1.4),
        # or int64(3) vs HUGEINT→float64(3.0), breaks the hash even when
        # every value is numerically identical. Emulate it with a strict
        # stringified compare (identical float64 bits stringify the same;
        # int32 vs int64 stringify the same — both are hash-stable).
        try:
            str_eq = sv.astype(str).equals(dv.astype(str))
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                eq = np.array_equal(
                    sv.astype("float64").to_numpy(),
                    dv.astype("float64").to_numpy(),
                    equal_nan=True,
                )
            else:
                eq = str_eq
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
            continue
        if not eq or not str_eq:
            mism = (sv.astype(str) != dv.astype(str)).to_numpy().nonzero()[0][:3]
            ex = [(int(i), sv.iloc[i], dv.iloc[i]) for i in mism]
            kind = "differs" if not eq else "hash-unstable (values equal)"
            problems.append(f"col {c} {kind}, e.g. {ex}")
    return problems


def main() -> int:
    import __spark_entry__ as entrymod
    from searchengine_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"WARN {name}: empty result for rows-only entry")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(
                f"ok   {name}: {len(spark_pdf)} rows match "
                f"({time.time() - t0:.1f}s)"
            )
    # entry() smoke
    if not only:
        edf = entrymod.entry(spark)
        n = edf.count()
        print(f"entry(): {n} rows, schema={[f.name for f in edf.schema.fields]}")
        if n <= 0:
            failed.append("entry")
    print("FAILED:" if failed else "ALL GREEN", failed or "")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
