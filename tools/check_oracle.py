"""Local stand-in for the driver's correctness runner.

Runs each __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet tables (sf0.01 by
default), then compares row count, column names, and values
(rows sorted, columns sorted by name — like the driver's
order-insensitive value-hash). Reports per-query PASS/FAIL plus the
max numeric deviation so float-rounding risks are visible.

Usage: python tools/check_oracle.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_entry():
    sys.path.insert(0, ".")
    import __spark_entry__ as e

    return e


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class mirroring the driver's type-sensitive hash.
    DuckDB HUGEINT (e.g. sum() of an integer) arrives as float64/object,
    so an int-vs-float divergence flags exactly the bug class the float
    cast used to mask (VERDICT r1 item 2)."""
    dt = s.dtype
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.datetime64):
        return "ts"
    return "other"


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} duck={len(b)}"
    for c in sorted(a.columns):
        ca, cb = _dtype_class(a[c]), _dtype_class(b[c])
        if ca != cb:
            return False, (
                f"col {c}: dtype class differs: spark={a[c].dtype}({ca}) "
                f"duck={b[c].dtype}({cb}) — driver's type-sensitive hash would fail"
            )
    a, b = canon(a), canon(b)
    max_dev = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.number) and np.issubdtype(bv.dtype, np.number):
            aa, bb = av.astype(float).to_numpy(), bv.astype(float).to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            dev = np.abs(aa - bb)
            dev[both_nan] = 0.0
            if np.isnan(dev).any():
                return False, f"col {c}: NaN mismatch"
            max_dev = max(max_dev, float(dev.max()) if len(dev) else 0.0)
            if (dev > 1e-9).any():
                i = int(dev.argmax())
                return False, f"col {c}: value dev {dev.max():.3g} at row {i} (spark={aa[i]} duck={bb[i]})"
        else:
            av2, bv2 = av.astype(str), bv.astype(str)
            if not (av2 == bv2).all():
                i = int((av2 != bv2).to_numpy().argmax())
                return False, f"col {c}: mismatch at row {i}: spark={av2[i]!r} duck={bv2[i]!r}"
    return True, f"ok ({len(a)} rows, max numeric dev {max_dev:.2g})"


def main():
    sf_dir = "/root/testdata/sf0.01"
    args = []
    skip = set()
    for i, a in enumerate(sys.argv[1:], start=1):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip.add(i + 1)
        elif not a.startswith("--") and i not in skip:
            args.append(a)

    e = load_entry()
    qs = e.queries()
    oq = e.oracle_sql()
    names = args or list(qs)

    from webdq.session import build_session

    spark = build_session("local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        if name not in oq:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows (no oracle SQL)")
            continue
        try:
            ddf = duck_run(oq[name], sf_dir)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {str(ex)[:200]}")
            failures.append(name)
            continue
        ok, msg = compare(name, sdf, ddf)
        print(("PASS" if ok else "FAIL") + f" {name}: {msg}")
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
