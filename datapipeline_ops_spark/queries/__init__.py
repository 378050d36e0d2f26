"""Query inventory. Importing this package registers every query in
``datapipeline_ops_spark.core.registry.QUERIES``."""

from datapipeline_ops_spark.queries import (  # noqa: F401
    analytics_extra,
    behavior_extra,
    classic_ml,  # imports lm_quality: reuses the trained-gate feature table
    corpus_lm_extra,
    curation_extra,
    decomposition,
    dedup,
    diversity,
    drift_quality,
    elo_ratings,
    evaluation,
    experiment_stats,
    graph_queries,
    inference_queries,
    io_queries,
    kmeans_loop,  # after similarity: reuses its seed constants + CTE mirror
    layout_queries,
    lm_quality,
    mlops_extra,
    multimodal,
    pipeline_analogs,
    pipelines_e2e,
    pretrain_e2e,  # after curation_extra/corpus_lm_extra/lm_quality: composes their constants
    profiling,
    quantization,
    relational,
    relational_extra,
    robustness,
    sampling_sketch,
    similarity,
    search_rank,  # after similarity: composes its registered oracles
    stateful,
    streaming_queries,
    survival_econ,
    temporal_queries,
    tpch_shapes,
    textstats,
    udtf_queries,
    web_curation,
    windows_extra,
)

from datapipeline_ops_spark.core.registry import QUERIES  # noqa: F401
