"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(pdf) -> str:
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # normalize ints and floats; stable row order via lexicographic sort
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
    rows = pdf.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from gpx2tiles_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app="oracle-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_con():
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return con

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING: empty result")
            continue
        try:
            con = fresh_con()
            ddf = con.sql(oracles[name]).df()
            con.close()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"schema {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems:
            h1, h2 = value_hash(sdf), value_hash(ddf)
            if h1 != h2:
                problems.append("value hash mismatch")
                merged = sdf.reindex(sorted(sdf.columns), axis=1)
                d2 = ddf.reindex(sorted(ddf.columns), axis=1)
                a = set(map(tuple, merged.astype(str).values))
                b = set(map(tuple, d2.astype(str).values))
                diff_a = list(a - b)[:3]
                diff_b = list(b - a)[:3]
                problems.append(f"spark-only={diff_a} duck-only={diff_b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(map(str, problems))}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
