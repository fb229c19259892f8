"""Query registry: named DataFrame plans paired with oracle SQL."""

from lol_data_pipeline_spark.plans.queries import REGISTRY, QuerySpec  # noqa: F401
import lol_data_pipeline_spark.plans.extensions  # noqa: E402,F401  (registers ext queries)
import lol_data_pipeline_spark.plans.streaming_queries  # noqa: E402,F401
import lol_data_pipeline_spark.plans.catalog  # noqa: E402,F401
import lol_data_pipeline_spark.plans.tpch  # noqa: E402,F401
import lol_data_pipeline_spark.plans.sketches  # noqa: E402,F401
import lol_data_pipeline_spark.plans.corpus  # noqa: E402,F401
import lol_data_pipeline_spark.plans.behavior  # noqa: E402,F401
