"""Text primitives: tokenization, shingling, and their exact DuckDB twins.

Every Spark expression here has a ``sql_*`` mirror producing *bit-identical*
values in DuckDB, so hash-dependent operators (MinHash, SimHash, LSH) can be
verified value-for-value by the oracle. Rules that keep the two in lockstep:

- tokenize on ``\\s+`` in both engines;
- 1-based array indexing in both (``element_at`` / ``l[i]``);
- word n-gram shingles joined with a single space;
- docs shorter than the shingle width fall back to the whole text as the
  single shingle (guarding Spark's ``sequence`` which would go *descending*
  on a negative range).

The reference has no text operators (its ``common/text/`` is an empty stub —
``Text_README.md:1-3``); this module is part of the beyond-reference
training-data surface (north star in BASELINE.json).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

SHINGLE_N = 3


def tokens(text: Column) -> Column:
    return F.split(text, r"\s+")


def sql_tokens(expr: str) -> str:
    return f"regexp_split_to_array({expr}, '\\s+')"


def shingles_from(t: Column, text: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles from an already-computed token array.

    Pass a MATERIALIZED token column (one that crossed an exchange or
    persist since it was computed) and each ``element_at`` is an O(1)
    array access; pass the raw ``tokens(text)`` expression and Catalyst's
    project-collapsing inlines the split into every position — O(len^2)
    per document (measured 13x on the winnowing family at sf0.1)."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, make).otherwise(F.array(text))


def shingles(text: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles; whole text if fewer than n tokens. Quadratic
    in document length unless the token array is materialized first — for
    hot paths use :func:`shingles_from` behind a repartition/persist."""
    return shingles_from(tokens(text), text, n)


def sql_shingles(expr: str, n: int = SHINGLE_N) -> str:
    t = sql_tokens(expr)
    parts = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return (
        f"(SELECT CASE WHEN len(t) >= {n} THEN "
        f"list_transform(generate_series(1, len(t) - {n - 1}), i -> {parts}) "
        f"ELSE [{expr}] END FROM (SELECT {t} AS t))"
    )
