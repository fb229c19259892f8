"""Run the driver-shaped gauntlet for NAMED registry entries only —
the targeted re-verification loop for maintenance work (full
gauntlet: tools/driver_gauntlet.py).

Usage: python tools/gauntlet_subset.py <sf_dir> name [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from tools.check_parity import (  # noqa: E402
    audit_dtype_agreement,
    audit_oracle_types,
)
from tools.driver_gauntlet import driver_canon, pandas_compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    from lol_data_pipeline_spark.io import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()

    n_pass = n_fail = 0
    for name in names:
        if name not in qs:
            print(f"✗ {name}: NOT IN REGISTRY")
            n_fail += 1
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as ex:
            print(f"✗ {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        sql = osql.get(name)
        if sql is None:
            try:
                driver_canon(spark_pdf)
                print(f"~ {name}: rows-only ({len(spark_pdf)} rows)")
                n_pass += 1
            except Exception as ex:
                print(f"✗ {name}: CANON-CRASH rows-only: {type(ex).__name__}")
                n_fail += 1
            continue
        try:
            type_flags = audit_oracle_types(con, sql)
            duck_pdf = con.execute(sql).df()
        except Exception as ex:
            print(f"✗ {name}: DUCKDB ERROR {str(ex)[:200]}")
            n_fail += 1
            continue
        issues = pandas_compare(name, spark_pdf, duck_pdf)
        if type_flags:
            issues.append(f"ORACLE-TYPE {type_flags}")
        dtype_flags = audit_dtype_agreement(sdf.schema, con, sql)
        if dtype_flags:
            issues.append(f"DTYPE-DISAGREE {dtype_flags}")
        if issues:
            print(f"✗ {name}: " + " | ".join(issues))
            n_fail += 1
        else:
            print(f"✓ {name} ({len(spark_pdf)} rows)")
            n_pass += 1
    print(f"\nsubset: {n_pass} pass, {n_fail} fail of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
