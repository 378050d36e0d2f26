from datapipeline_ops_spark.core.op import Op, Pipeline, op  # noqa: F401
from datapipeline_ops_spark.core.registry import QUERIES, QuerySpec, query  # noqa: F401
