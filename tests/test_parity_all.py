"""Full-registry oracle parity sweep.

The driver's CORRECTNESS gate samples ~50 of the registry's entries;
round 3 proved the unsampled remainder can rot silently (5 streaming
queries returned wrong answers for a full round). This sweep runs
EVERY oracled entry against DuckDB at sf0.01 — the SAME scale factor
as the driver's gate (the round-3 bug only manifested clearly at
sf0.01 row counts; sweeping smaller than the gate leaves that gap) —
so any regression fails CI, not just the sampled subset.

Marked slow; deselect with ``-m 'not slow'`` for a quick iteration
loop. One parametrized test per entry so a failure names the exact
query and -x stops at the first.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from lol_data_pipeline_spark.io import TABLES, table_path
from lol_data_pipeline_spark.plans import REGISTRY
from tools.check_parity import compare

ORACLED = sorted(name for name, spec in REGISTRY.items() if spec.sql)

# the driver's gate runs at sf0.01; fall back for environments that
# only ship the small fixture
SF_GATE = (
    "/root/testdata/sf0.01"
    if os.path.isdir("/root/testdata/sf0.01")
    else "/root/testdata/sf0.001"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_GATE, t)}'"
        )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_GATE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(spec.sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    issues = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
    assert not issues, f"{name}: " + " | ".join(issues)


def test_every_query_has_oracle_or_is_documented():
    """Rows-only entries (no SQL oracle) must stay a short, known
    list — a new entry without an oracle is a coverage regression."""
    no_oracle = sorted(n for n, s in REGISTRY.items() if not s.sql)
    assert no_oracle == [], no_oracle
