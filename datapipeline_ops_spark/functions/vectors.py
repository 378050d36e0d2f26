"""Vector primitives over ``array<float>`` embedding columns.

Spark-first: dot products and norms are `zip_with` + `aggregate` over JVM
arrays — no Python, no UDF, whole-stage codegen. All arithmetic is done in
DOUBLE with left-to-right accumulation in *element order*, which makes the
values bit-identical to the DuckDB mirrors (same IEEE ops in the same order),
so similarity thresholds and rankings agree exactly across engines.

DATA CONTRACT: embedding vectors are NON-ZERO. Every cosine here divides
by the product of norms with no zero guard — mirrored exactly in the DuckDB
oracles — because a zero-norm "embedding" is a broken upstream encoder, not
a similarity question; ``embedding_norm_audit`` is the registered gate that
counts/quarantines degenerate vectors before any cosine stage runs (the
normalize-at-ingest topology every production vector store uses). The
oracle-parity fuzzer generates contract-conforming vectors for the same
reason.

At 100 TB scale the same expressions vectorize fine, but the win is
structural: brute-force scoring is a broadcast nested-loop join (small query
side), and the LSH variant (see queries/similarity.py) turns the quadratic
pair space into an equi-join on bucket signatures — the shuffle is on
single-int keys, never on the vectors themselves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance, left-to-right double fold in element order —
    bit-identical to :func:`sql_sqdist` (same IEEE ops, same order), so
    cross-engine argmin tie-breaks agree without a tolerance."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB mirrors (expr strings name list columns of DOUBLE) --------------

def sql_as_double(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def sql_dot(a: str, b: str) -> str:
    # same element order, same double accumulation as F.aggregate
    return f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_sqdist(a: str, b: str) -> str:
    # same element order, same double accumulation as F.aggregate in sqdist
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
