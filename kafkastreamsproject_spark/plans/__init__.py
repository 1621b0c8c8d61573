from kafkastreamsproject_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    register,
)
