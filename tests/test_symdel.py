"""Pin the SymSpell deletion-key helper against plain Python slicing: for
every (word, position) pair, _del_at must equal word with that 1-based char
removed (and the word itself at position 0) — the invariant the blocking
equi-join's correctness rests on."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.mlops_extra import _del_at

WORDS = [
    "a", "ab", "abc", "table", "merge", "banana", "xxxxxxxx",
    "spark-graft", "0123456789", "repeated-letters-eeee",
]


def test_del_at_matches_python_slicing(spark):
    rows = [(w, i) for w in WORDS for i in range(len(w) + 1)]
    df = spark.createDataFrame(rows, "word string, i int")
    got = {
        (r["word"], r["i"]): r["key"]
        for r in df.select(
            "word", "i", _del_at(F.col("word"), F.col("i")).alias("key")
        ).collect()
    }
    for w, i in rows:
        expect = w if i == 0 else w[: i - 1] + w[i:]
        assert got[(w, i)] == expect, (w, i, got[(w, i)], expect)
