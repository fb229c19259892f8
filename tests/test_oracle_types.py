"""Oracle output-type audit (driver-faithfulness gate).

The driver's correctness comparator fetches DuckDB results through
pandas, where HUGEINT becomes float64, TIMESTAMP WITH TIME ZONE keeps
tzinfo (vs Spark's naive timestamp), and DECIMAL diverges from Spark's
double — so an oracle whose OUTPUT schema contains any of these types
hash-mismatches even when every value agrees. Round 6 lost four
CORRECTNESS rows to exactly this class (to_timestamp() TIMESTAMPTZ and
uncast sum() HUGEINT); this test pins the fix: DESCRIBE every oracle
and fail on any drift-prone output column.

No Spark session needed — DuckDB DESCRIBE alone determines the schema.
"""

from __future__ import annotations

import duckdb
import pytest

from lol_data_pipeline_spark.io import TABLES, table_path
from lol_data_pipeline_spark.plans import REGISTRY
from tools.check_parity import audit_oracle_types

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'")
    return c


def test_no_drift_prone_oracle_output_types(con):
    flagged = {}
    for name, spec in REGISTRY.items():
        if spec.sql is None:
            continue
        bad = audit_oracle_types(con, spec.sql)
        if bad:
            flagged[name] = bad
    assert not flagged, (
        "Oracles with HUGEINT / TIMESTAMPTZ / DECIMAL output columns "
        f"(driver hash-mismatch risk): {flagged}"
    )
