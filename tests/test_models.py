"""Tests for the per-executor model registry and the stub model contract."""

import pandas as pd
import pytest

from datapipeline_ops_spark.models.registry import (
    clear_instances,
    get_model,
    register_model,
)
from datapipeline_ops_spark.models.stubs import (
    StubQualityModel,
    StubSimilarityModel,
    register_stubs,
)


def test_registry_lazy_singleton():
    calls = []

    class M:
        def __init__(self):
            calls.append(1)

    register_model("_t", M)
    clear_instances()
    register_stubs()  # clear_instances wipes built stubs too; re-register factories
    a, b = get_model("_t"), get_model("_t")
    assert a is b and len(calls) == 1


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model("nope-no-such-model")


def test_quality_stub_deterministic_and_bounded():
    m = StubQualityModel()
    s = m.predict(pd.Series(["1", "2", "1"]))
    assert s.iloc[0] == s.iloc[2]
    assert ((s >= 0) & (s < 1)).all()


def test_similarity_stub_symmetric():
    m = StubSimilarityModel()
    ab = m.score(pd.Series(["x"]), pd.Series(["y"])).iloc[0]
    ba = m.score(pd.Series(["y"]), pd.Series(["x"])).iloc[0]
    assert ab == ba
