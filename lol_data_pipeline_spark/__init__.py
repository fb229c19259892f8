"""lol_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and
data-processing capabilities of the reference ETL pipeline
(zwilson999/lol_data_pipeline — REST source → dedup → flatten →
overwrite sink; see SURVEY.md), extended with the full relational
surface (joins/aggregations/windows/set-ops), LLM-data-pipeline
operators (dedup families, similarity search, text analysis,
multimodal columns) and Structured Streaming.

Design rules (100 TB posture):
- DataFrame/SQL only; plans are declarative so Catalyst handles
  pushdown, pruning, join selection and AQE handles skew/coalesce.
- No driver-side .collect() in any operator path.
- Built-in `pyspark.sql.functions` in the hot path; Arrow-batched
  pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from lol_data_pipeline_spark.session import get_spark  # noqa: F401
from lol_data_pipeline_spark.io import TABLES, load_table, register_views  # noqa: F401
