"""Streaming sinks: foreachBatch for exactly-once batch-style writes.

The memory sink (windows.run_to_completion) is for tests/oracles;
real deployments write through foreachBatch so each micro-batch can
use the full batch writer API (overwrite-by-epoch = idempotent
replay, the standard exactly-once pattern on object storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lol_data_pipeline_spark.streaming.windows import _ckpt_dir


def write_stream_foreach_batch(
    agg: DataFrame, out_dir: str, mode: str = "update"
) -> list[int]:
    """Run a streaming aggregation to completion, writing each
    micro-batch to ``out_dir/epoch=N`` via foreachBatch. Returns the
    epoch ids written. Overwrite-per-epoch makes retried batches
    idempotent (exactly-once on replay)."""
    seen: list[int] = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        seen.append(epoch_id)
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        agg.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", _ckpt_dir())
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return seen
