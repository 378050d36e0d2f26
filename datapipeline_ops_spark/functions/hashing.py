"""Deterministic cross-engine 60-bit hashing.

The engine needs hash functions whose exact values reproduce in ANSI SQL so
the DuckDB correctness oracle can verify hash-dependent operators (MinHash,
SimHash, LSH bucketing, stub ML scorers). Native hashes differ across engines
(Spark xxhash64 ≠ DuckDB hash), so we derive a 60-bit integer from the md5
hex digest — md5 is bit-identical everywhere:

    Spark:  conv(substring(md5(s), 1, 15), 16, 10)  ->  decimal string -> long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits < 63, so the value is always a non-negative BIGINT and
exact in both engines. Seeded variants prepend "seed:" to the input.

This is the same seam the reference uses for testability — injected scorers
(``similarity_op.py:8-10``, ``face_quality_op.py:23-37``) — made
deterministic: a "model score" is hash_unit(key) in [0, 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

HASH_MOD = 1_000_000


def hash64(col: Column, seed: int | None = None) -> Column:
    """60-bit non-negative deterministic hash of a string column."""
    s = col.cast("string") if seed is None else F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def sql_hash64(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL producing the identical value as :func:`hash64`."""
    s = f"CAST({expr} AS VARCHAR)" if seed is None else f"'{seed}:' || CAST({expr} AS VARCHAR)"
    return f"('0x' || substr(md5({s}), 1, 15))::BIGINT"


def hash_unit(col: Column, seed: int | None = None) -> Column:
    """Deterministic pseudo-score in [0, 1) with 1e-6 resolution — the stub
    'model' used wherever the reference injects a GPU scorer."""
    return (hash64(col, seed) % HASH_MOD) / F.lit(float(HASH_MOD))


def sql_hash_unit(expr: str, seed: int | None = None) -> str:
    return f"({sql_hash64(expr, seed)} % {HASH_MOD}) / {float(HASH_MOD)}"
