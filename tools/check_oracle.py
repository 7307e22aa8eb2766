"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at a given sf dir, then compares row count, column names, and an
order-insensitive value comparison (exact for ints/strings/bools/dates,
bitwise for floats since the catalog is engineered for bit-parity).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df_pd):
    import pandas as pd

    out = df_pd.copy()
    out.columns = [c.lower() for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except TypeError:
                pass
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(name, spark_pd, duck_pd) -> list[str]:
    problems = []
    if len(spark_pd) != len(duck_pd):
        return [f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}"]
    a, b = normalize(spark_pd), normalize(duck_pd)
    if list(a.columns) != list(b.columns):
        return [f"columns spark={list(a.columns)} duck={list(b.columns)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) == "float64":
            ok = [
                (x == y) or (math.isnan(x) and math.isnan(y)) or (pd_isna(x) and pd_isna(y))
                for x, y in zip(av.tolist(), bv.tolist())
            ]
            bad = [i for i, o in enumerate(ok) if not o]
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            bad = list(neq[neq].index)
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)} mismatched rows, first at {i}: "
                f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
            )
    return problems


def pd_isna(x):
    import pandas as pd

    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark import (
        get_spark,
    )

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
