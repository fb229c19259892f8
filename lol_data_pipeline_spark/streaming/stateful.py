"""Custom stateful streaming operators via applyInPandasWithState.

``F.window``/``session_window`` cover the declarative cases; this is
the escape hatch for operator semantics Spark lacks: arbitrary
per-key state evolved batch-by-batch (counters, CEP-ish flags,
decayed aggregates). State lives in the state store (checkpointed,
fault-tolerant); the pandas function only ever sees one key's rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lol_data_pipeline_spark.streaming.windows import _events_stream, run_to_completion

OUTPUT_DDL = "user_id bigint, n_events bigint, sum_value double"
STATE_DDL = "n bigint, s double"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals as a custom stateful operator: state =
    (count, sum) per user, one updated row emitted per key per
    micro-batch."""
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_completion(agg, mode="update")
