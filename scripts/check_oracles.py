"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at sf0.01,
compare row count, schema (sorted column names), and order-insensitive
values.  Usage:  python scripts/check_oracles.py [sf_dir] [name...]"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and tiny fp noise beyond the query's rounding
        return "%.9g" % (v + 0.0)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def df_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from osm_export_tool_python_spark.plans.session import default_session

    spark = default_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'" % (t, sf_dir, t)
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, "SPARK ERROR: %s" % e))
            print("FAIL  %-24s spark error: %s" % (name, str(e)[:200]))
            continue
        if name not in oracles:
            print("ROWS  %-24s %d rows (no oracle)" % (name, len(srows)))
            continue
        try:
            # Fetch through Arrow so DuckDB types surface exactly as the
            # driver's gate sees them (e.g. SUM over ints -> HUGEINT ->
            # decimal128, which does NOT equal a Spark bigint).  fetchall()
            # silently coerces HUGEINT->int and hides that class of bug.
            tbl = con.execute(oracles[name]).arrow()
            dcols = list(tbl.column_names)
            dpylists = [tbl.column(c).to_pylist() for c in dcols]
            drows = list(zip(*dpylists)) if dcols else []
        except Exception as e:  # noqa: BLE001
            failures.append((name, "DUCKDB ERROR: %s" % e))
            print("FAIL  %-24s duckdb error: %s" % (name, str(e)[:200]))
            continue
        sc, sr = df_to_rows(scols, srows)
        dc, dr = df_to_rows(dcols, drows)
        if sc != dc:
            failures.append((name, "schema %s vs %s" % (sc, dc)))
            print("FAIL  %-24s schema: %s vs %s" % (name, sc, dc))
        elif len(sr) != len(dr):
            failures.append((name, "rows %d vs %d" % (len(sr), len(dr))))
            print("FAIL  %-24s rowcount: %d vs %d" % (name, len(sr), len(dr)))
        elif sr != dr:
            diff_a = [r for r in sr if r not in set(dr)][:3]
            diff_b = [r for r in dr if r not in set(sr)][:3]
            failures.append((name, "values"))
            print("FAIL  %-24s values; spark-only=%s duckdb-only=%s" % (name, diff_a, diff_b))
        else:
            print("OK    %-24s %d rows" % (name, len(sr)))

    ran = [n for n in qs if n in oracles and (not only or n in only)]
    print("\n%d/%d compared queries OK" % (
        len([1 for n in ran if not any(f[0] == n for f in failures)]),
        len(ran),
    ))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
