"""datapipeline_ops_spark — a PySpark-native data-pipeline / analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference multimodal curation framework
(``HrLi97/dataPipeline_ops``): per-record operator chains (probe → filter →
enrich → explode → aggregate → dedup → sink) become declarative
``DataFrame -> DataFrame`` transforms that Catalyst can optimize end-to-end,
plus the large-scale training-data operators such a pipeline needs at 100 TB
(dedup families, ANN similarity search, text analysis, multimodal columns,
structured streaming).

Design stance (see SURVEY.md §7):
- operators are lazy DataFrame transforms with explicit schemas; no mutable
  item dicts, no convention-only keys;
- errors are data (nullable ``error`` columns), never executor exceptions;
- everything relational stays in native ``pyspark.sql.functions`` so
  predicate pushdown / column pruning / whole-stage codegen apply;
- Python only crosses the Arrow boundary for genuinely imperative semantics
  (greedy sequential dedup, media decode), always vectorized.
"""

__version__ = "0.1.0"

from datapipeline_ops_spark.session import get_spark  # noqa: F401
from datapipeline_ops_spark.tables import load_tables  # noqa: F401
