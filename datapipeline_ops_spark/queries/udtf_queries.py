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


# ---------------------------------------------------------------------------
# token_chunk_udtf — second, structurally different UDTF: bounded sliding
# window over the token sequence (chunk planner), vs the unbounded
# regex-split expansion above
# ---------------------------------------------------------------------------

from datapipeline_ops_spark.core.registry import QUERIES as _REG
from datapipeline_ops_spark.queries.lm_quality import (  # noqa: E402
    _CHUNK_STRIDE,
    CHUNK_N,
)


@udtf(
    returnType="chunk_idx int, start_tok bigint, chunk_len bigint, chunk_md5 string",
    useArrow=True,
)
class TokenChunks:
    """Sliding token-window TVF: {CHUNK_N}-token chunks at the rag_chunk_plan
    stride, each content-addressed by the md5 of its space-joined tokens.
    MUST emit exactly rag_chunk_plan's rows — the cross-query identity in
    tools/check_invariants.py pins the two row sets equal, so the Python
    windowing and the relational windowing gate each other."""

    def eval(self, text: str):  # noqa: D102 - contract is the class doc
        import hashlib
        import re

        # ASCII \s only: Spark's split() (Java \s) and the shared DuckDB
        # oracle (RE2 \s) never split on Unicode whitespace (NBSP,  ,
        # ...), so the Python seam must not either — otherwise this UDTF
        # diverges from rag_chunk_plan (identity-pinned) on real web text.
        t = re.split(r"\s+", text or "", flags=re.ASCII)
        m = len(t)
        n_chunks = 1 if m <= CHUNK_N else 1 + -(-(m - CHUNK_N) // _CHUNK_STRIDE)
        for j in range(n_chunks):
            start = j * _CHUNK_STRIDE
            end = min(start + CHUNK_N, m)
            piece = " ".join(t[start:end])
            yield (
                j,
                start,
                end - start,
                hashlib.md5(piece.encode("utf-8")).hexdigest(),
            )


@query("token_chunk_udtf", oracle=_REG["rag_chunk_plan"].oracle)
def token_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunk planning via a lateral-joined Arrow UDTF — the same
    contract as :func:`rag_chunk_plan` (same oracle SQL verbatim, and a
    cross-query identity pins the two row sets equal), expressed through
    the Python-table-function seam instead of relational explode+slice.
    Where `sentence_split_udtf` exercises unbounded regex expansion with
    per-piece state, this one exercises BOUNDED windowed expansion with
    arithmetic chunk planning — the two structural shapes of a
    record-to-many operator.

    Plan shape: single documents scan -> Arrow-batched UDTF generate node;
    no shuffle, no driver materialization; linear in corpus size."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spark.udtf.register("token_chunks", TokenChunks)
    d.createOrReplaceTempView("udtf_chunk_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.start_tok, c.chunk_len, c.chunk_md5
        FROM udtf_chunk_docs_in d, LATERAL token_chunks(d.text) c
        """
    )
