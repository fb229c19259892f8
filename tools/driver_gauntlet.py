"""Driver-shaped correctness gauntlet.

Replays the EXTERNAL gate's exact shape before the external gate does:
- a PLAIN SparkSession (no engine configs, default ~1g driver heap —
  the config that exposed the round-6 lineage OOM), relying on
  __spark_entry__._configure for the mandatory confs, exactly like the
  driver;
- the FIRST N (default 50) registry entries in iteration order — the
  driver's sample window;
- the strict comparator from tools/check_parity.py (tz-aware vs naive
  FAILS; oracle output-type audit flags HUGEINT/TIMESTAMPTZ/DECIMAL).

Usage: python tools/driver_gauntlet.py [sf_dir] [N]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from tools.check_parity import audit_oracle_types, compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    sample = list(qs)[:n_sample]

    from lol_data_pipeline_spark.io import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    # plain session — the external verifier's config, NOT get_spark
    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()

    n_pass = n_fail = n_rows_only = 0
    for name in sample:
        try:
            sdf = qs[name](spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"✗ {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"~ {name}: rows-only ({len(spark_rows)} rows)")
            n_rows_only += 1
            continue
        try:
            type_flags = audit_oracle_types(con, sql)
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as ex:
            print(f"✗ {name}: DUCKDB ERROR {str(ex)[:200]}")
            n_fail += 1
            continue
        issues = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
        if type_flags:
            issues.append(f"ORACLE-TYPE {type_flags}")
        if issues:
            print(f"✗ {name}: " + " | ".join(issues))
            n_fail += 1
        else:
            print(f"✓ {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(
        f"\ngauntlet: {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(sample)} sampled (plain session, {sf_dir})"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
