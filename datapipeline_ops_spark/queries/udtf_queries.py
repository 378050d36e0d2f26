"""Python UDTF surface: table-valued functions lateral-joined per input row.

The reference's whole framework is a row-wise UDF harness
(``common/base_ops.py:17-22``); ops that EXPAND one record into many (scene
segments — ``scene_segmenter_op.py:162-173``; frame samples —
``decord_reader_op.py:43-48``) return lists that downstream code iterates.
The Spark-4-native expression of that shape is a **user-defined table
function**: one input row in, a stream of typed rows out, lateral-joined so
every output row keeps its parent's columns. Where the expansion logic is
expressible as array expressions we use ``explode(sequence(...))`` (see
``operators/segments.py``) and stay JVM-side; the UDTF is the escape hatch
for expansion logic that genuinely needs Python (here: regex sentence
splitting with per-piece state), Arrow-batched like every other Python seam
in the engine.

At 100 TB a UDTF is a pure map-side expansion — zero shuffles; output rows
never exist as a driver-side list (contrast the reference, which
materializes each expansion list inside the worker dict).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table

# clause delimiter: sentence punctuation OR the stopword "the" — the
# synthetic corpus has no punctuation, so the stopword alternative is what
# actually exercises multi-piece expansion (avg ~5 clauses/doc at sf0.01)
_SENT_SPLIT = r"[.!?]+|\s+the\s+"


@udtf(returnType="sent_idx int, sentence string, n_chars int", useArrow=True)
class SplitSentences:
    """Clause splitter TVF: split on ``[.!?]+`` runs or a delimiting
    stopword, trim ASCII whitespace, drop empty pieces, number surviving
    clauses 1..n. Mirrored 1:1 by the DuckDB oracle's string_split_regex +
    running non-empty count."""

    def eval(self, text: str):  # noqa: D102 - contract is the class doc
        import re

        idx = 0
        for piece in re.split(_SENT_SPLIT, text or ""):
            s = piece.strip(" \t\n\r")
            if s:
                idx += 1
                yield idx, s, len(s)


@query(
    "sentence_split_udtf",
    oracle=f"""
    WITH parts AS (
        SELECT doc_id, string_split_regex(text, '{_SENT_SPLIT}') AS ps
        FROM documents
    ),
    pieces AS (
        SELECT doc_id, i,
               trim(ps[i], ' ' || chr(9) || chr(10) || chr(13)) AS sentence
        FROM parts,
             LATERAL (SELECT unnest(generate_series(1, len(ps))) AS i) t
    ),
    numbered AS (
        SELECT doc_id, sentence, length(sentence) AS n_chars,
               CAST(sum(CASE WHEN sentence <> '' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY i) AS INTEGER)
                   AS sent_idx
        FROM pieces
    )
    SELECT doc_id, sent_idx, sentence, n_chars
    FROM numbered WHERE sentence <> ''
    """,
)
def sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence explosion via a lateral-joined Python UDTF —
    the record→many-records expansion shape of the reference's segment
    planner (``scene_segmenter_op.py:162-173``) for logic that needs
    Python. Output keeps the parent doc_id next to each numbered sentence.

    Plan shape: a single documents scan feeding an Arrow-batched UDTF
    generate node — no shuffle, no driver materialization; scales linearly
    with corpus size and parallelizes per input partition."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spark.udtf.register("split_sentences", SplitSentences)
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM udtf_docs_in d, LATERAL split_sentences(d.text) s
        """
    )
