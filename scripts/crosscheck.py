"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet dir; compare row count, column names, and
order-insensitive values.

Usage: python scripts/crosscheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(rows, cols):
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)  # full precision — mismatches must surface
        return str(v)

    return sorted(tuple(cell(r[c]) for c in sorted(cols)) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from exam_pdf_parser_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("crosscheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows={len(sdf):6d}  (rows-only, no oracle)")
            continue
        ddf = con.sql(oracles[name]).df()
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            failures.append(name)
            print(f"{name:28s} COLUMN MISMATCH spark={scols} duck={dcols}")
            continue
        a = canon(sdf.to_dict("records"), scols)
        b = canon(ddf.to_dict("records"), dcols)
        if len(a) != len(b):
            failures.append(name)
            print(f"{name:28s} ROWCOUNT spark={len(a)} duck={len(b)}")
        elif a != b:
            failures.append(name)
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"{name:28s} VALUE MISMATCH at {diff}")
            for i in diff[:2]:
                print(f"   spark: {a[i]}")
                print(f"   duck : {b[i]}")
        else:
            print(f"{name:28s} OK rows={len(a)}")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
