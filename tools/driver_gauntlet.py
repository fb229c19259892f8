"""Driver-shaped correctness gauntlet.

Replays the EXTERNAL gate's exact shape before the external gate does:
- a PLAIN SparkSession (no engine configs, default ~1g driver heap —
  the config that exposed the round-6 lineage OOM), relying on
  __spark_entry__._configure for the mandatory confs, exactly like the
  driver;
- the FIRST N (default 50) registry entries in iteration order — the
  driver's sample window;
- the DRIVER'S OWN canonicalization shape: both sides fetched into
  pandas, every column lex-sorted via sort_values, cells stringified,
  THEN compared. This is what the r07 gauntlet lacked — it said
  182/182 on tuple-compare while the driver crashed on unhashable
  list cells and hash-mismatched a float64-vs-int8 sign column. A
  pandas sort over an ARRAY column raises here exactly as it does in
  the driver, and '1.0' != '1' fails here exactly as the value-hash
  does there;
- the strict audits from tools/check_parity.py (HUGEINT/TIMESTAMPTZ/
  DECIMAL/nested oracle outputs; Spark-vs-DuckDB dtype disagreement).

Usage: python tools/driver_gauntlet.py [sf_dir] [N]
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


def _canon_cell(v):
    """Stringify one cell the way date-producing entries' driver-green
    history implies: Spark DATE arrives as datetime.date ('2024-01-02')
    while DuckDB DATE arrives as a midnight Timestamp ('2024-01-02
    00:00:00'), and those entries pass the driver — so midnight
    timestamps collapse to the date string on BOTH sides (symmetric:
    cannot create a one-sided mismatch)."""
    import datetime as dt
    import math

    # missing values: Spark string-null is None, duck's is NaN — one
    # symbol for both so a representation artifact can't mismatch
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, dt.datetime):
        if (
            v.hour == v.minute == v.second == 0
            and v.microsecond == 0
            and getattr(v, "nanosecond", 0) == 0
        ):
            return v.date().isoformat()
        return str(v)
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def driver_canon(pdf):
    """Mimic the driver's pandas canonicalizer: sort by ALL columns
    (column order normalized by name first), then stringify every
    cell. Raises TypeError on list cells — deliberately, because the
    driver does (r07: ``TypeError: unhashable type: 'list'``)."""
    pdf = pdf.reindex(sorted(pdf.columns, key=str.lower), axis=1)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [
        tuple(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def pandas_compare(name, spark_pdf, duck_pdf):
    """Driver-shaped comparison; returns a list of issue strings."""
    issues = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"ROWCOUNT spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    d_cols = sorted(c.lower() for c in duck_pdf.columns)
    if s_cols != d_cols:
        issues.append(f"COLS spark={s_cols} duck={d_cols}")
    if issues:
        return issues
    try:
        s = driver_canon(spark_pdf)
    except Exception as ex:  # unhashable lists etc. — driver records err
        return [f"CANON-CRASH spark side: {type(ex).__name__}: {str(ex)[:120]}"]
    try:
        d = driver_canon(duck_pdf)
    except Exception as ex:
        return [f"CANON-CRASH oracle side: {type(ex).__name__}: {str(ex)[:120]}"]
    if s != d:
        n_diff = sum(1 for a, b in zip(s, d) if a != b)
        example = next(((a, b) for a, b in zip(s, d) if a != b), None)
        issues.append(f"VALUE-HASH {n_diff} canon rows differ; e.g. {example}")
    return issues


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
            spark_pdf = sdf.toPandas()
        except Exception as ex:
            print(f"✗ {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        sql = osql.get(name)
        if sql is None:
            # the driver's rows-only path still canonicalizes — an
            # array output column crashes it even without an oracle
            try:
                driver_canon(spark_pdf)
            except Exception as ex:
                print(f"✗ {name}: CANON-CRASH rows-only: {type(ex).__name__}")
                n_fail += 1
                continue
            print(f"~ {name}: rows-only ({len(spark_pdf)} rows)")
            n_rows_only += 1
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
    print(
        f"\ngauntlet: {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(sample)} sampled (plain session, {sf_dir})"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
