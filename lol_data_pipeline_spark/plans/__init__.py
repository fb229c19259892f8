"""Query registry: named DataFrame plans paired with oracle SQL."""

from lol_data_pipeline_spark.plans.queries import REGISTRY, QuerySpec  # noqa: F401
