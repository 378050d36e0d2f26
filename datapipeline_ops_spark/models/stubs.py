"""Deterministic stub models — the test doubles that slot into the same
injection seam the reference exposes (``similarity_op.py:8-10``,
``face_quality_op.py:23-37``: every model-backed op accepts an injected
model).

Each stub is a *vectorized* callable over pandas Series (the batch shape a
real torch model would get), and every score is md5-derived, so DuckDB
oracles can recompute the exact values — ML-shaped dataflow, value-level
verifiable, no GPU.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from datapipeline_ops_spark.models.registry import register_model


def _unit(s: str, seed: int) -> float:
    h = int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)
    return (h % 1_000_000) / 1_000_000.0


class StubQualityModel:
    """Face/image-quality scorer analog (CLIB-FIQA, ``face_quality_op.py``):
    score in [0,1) per key."""

    SEED = 21

    def predict(self, keys: pd.Series) -> pd.Series:
        return keys.astype(str).map(lambda k: _unit(k, self.SEED))


class StubDetector:
    """Detector analog (mmdet person boxes, ``person_detect_op.py``): a
    deterministic number of boxes (0..3) with md5-derived coordinates."""

    SEED = 22

    def predict(self, keys: pd.Series) -> pd.Series:
        def boxes(k: str) -> list[list[int]]:
            n = int(_unit(k, self.SEED) * 4)  # 0..3 boxes
            out = []
            for i in range(n):
                x1 = int(_unit(f"{k}:{i}:x", self.SEED) * 800)
                y1 = int(_unit(f"{k}:{i}:y", self.SEED) * 600)
                w = 1 + int(_unit(f"{k}:{i}:w", self.SEED) * 200)
                h = 1 + int(_unit(f"{k}:{i}:h", self.SEED) * 200)
                out.append([x1, y1, x1 + w, y1 + h])
            return out

        return keys.astype(str).map(boxes)


class StubSimilarityModel:
    """Pairwise similarity analog (AdaFace matcher, ``similarity_op.py``):
    symmetric score in [0,1) per (a, b) pair."""

    SEED = 23

    def score(self, a: pd.Series, b: pd.Series) -> pd.Series:
        def pair(t: tuple[str, str]) -> float:
            lo, hi = sorted(t)
            return _unit(f"{lo}|{hi}", self.SEED)

        return pd.Series(
            [pair(t) for t in zip(a.astype(str), b.astype(str))], index=a.index
        )


def register_stubs() -> None:
    """Idempotent registration of all stubs (safe on driver and executors)."""
    register_model("quality", StubQualityModel)
    register_model("detector", StubDetector)
    register_model("similarity", StubSimilarityModel)


register_stubs()
