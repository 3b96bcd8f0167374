"""Local harness mimicking the driver's correctness loop: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01, compare
row count, schema (sorted column names), and order-insensitive values."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(np.float64).round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(np.int64)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                av, bv = a[c].to_numpy(), b[c].astype(np.float64).to_numpy()
                ok = np.isclose(av, bv, rtol=1e-6, atol=1e-6, equal_nan=True)
                if not ok.all():
                    i = int(np.argmin(ok))
                    errs.append(f"col {c}: {int((~ok).sum())} diffs, e.g. row {i}: {av[i]} vs {bv[i]}")
            else:
                eq = (a[c].to_numpy() == b[c].to_numpy()) | (a[c].isna().to_numpy() & b[c].isna().to_numpy())
                if not eq.all():
                    i = int(np.argmin(eq))
                    errs.append(f"col {c}: {int((~eq).sum())} diffs, e.g. row {i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}")
    return errs


def main():
    import __spark_entry__ as entrymod
    from engine.session import get_spark

    only = sys.argv[1:] or None
    spark = get_spark("contract-check", cores=16)
    con = duck_con()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"ok   {name}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
    # entry smoke
    e = entrymod.entry(spark)
    n = e.count()
    print(f"entry smoke: {n} rows, schema={[f.name for f in e.schema.fields]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
