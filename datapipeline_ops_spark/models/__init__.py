from datapipeline_ops_spark.models.registry import (  # noqa: F401
    get_model,
    register_model,
)
