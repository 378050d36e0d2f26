from datapipeline_ops_spark.functions.hashing import hash64, hash_unit, sql_hash64, sql_hash_unit  # noqa: F401
