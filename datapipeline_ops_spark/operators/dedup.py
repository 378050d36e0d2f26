"""Deduplication operator family for large-scale training-data curation.

Beyond-reference surface (BASELINE.json north star): the reference dedups
only *faces within one video* (``video_extract_frame.py:202-230``); a corpus
pipeline needs document-level dedup at 100 TB. Four strategies, all pure
DataFrame ops:

- **exact**: md5(text) group-by; keeper = min id per hash. One shuffle on a
  16-byte key; partial agg makes it cheap at any scale.
- **MinHash + LSH**: k seeded min-hashes over word shingles (array exprs, no
  explode, no shuffle), banded into buckets; candidate pairs come from an
  equi-join on (band, bucket-hash) — the quadratic pair space never
  materializes. Verification joins candidates back to shingle arrays and
  computes exact Jaccard on array intersect/union.
- **SimHash**: bitwise-majority fingerprint of token hashes; near-dups are
  pairs within a Hamming radius (xor + bit_count on a single BIGINT — cheap
  enough to run after any blocking stage).
- **embedding cosine**: see queries/similarity.py (shares vector ops).

Every hash is the cross-engine md5-derived 60-bit hash
(functions/hashing.py), so the DuckDB oracle reproduces identical
signatures, buckets and pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from datapipeline_ops_spark.functions.hashing import hash64
from datapipeline_ops_spark.functions.text import shingles

MINHASH_K = 8
LSH_BANDS = 4  # k/bands rows per band
SIMHASH_BITS = 16


def with_shingles(df: DataFrame, text_col: str, out: str = "shingles") -> DataFrame:
    return df.withColumn(out, F.array_distinct(shingles(F.col(text_col))))


def minhash_signature(shingle_col: Column, k: int = MINHASH_K) -> Column:
    """Array of k min-hashes: sig[j] = min over shingles of hash64(s, seed=j)."""

    def seeded(j: int):
        # NB: the transform lambda must take exactly 1 param — PySpark
        # introspects arity and a 2-param lambda receives (element, index),
        # which would silently clobber a `j=j` default-arg seed.
        return lambda s: hash64(s, seed=j)

    return F.array(*[F.array_min(F.transform(shingle_col, seeded(j))) for j in range(k)])


def lsh_band_buckets(sig_col: Column, bands: int = LSH_BANDS, k: int = MINHASH_K) -> Column:
    """Array of (band_idx, bucket) structs; bucket = hash of the band's rows."""
    rows = k // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hash64(
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        *[F.element_at(sig_col, b * rows + r + 1).cast("string") for r in range(rows)],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / union


def simhash(token_col: Column, bits: int = SIMHASH_BITS) -> Column:
    """Bitwise-majority fingerprint: bit b set iff sum over tokens of
    (+1 if bit b of hash64(token) else -1) > 0."""
    th = F.transform(token_col, lambda t: hash64(t))

    def vote(bit: int) -> Column:
        # NB: merge lambda must take exactly 2 params — PySpark introspects
        # arity, so capture `bit` via this factory, not a default arg.
        return F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return fp
