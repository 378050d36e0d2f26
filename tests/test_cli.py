"""CLI surface tests (argument handling; execution is covered elsewhere)."""

import io
from contextlib import redirect_stderr, redirect_stdout

from datapipeline_ops_spark.__main__ import main


def test_list_filters_by_substring():
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["list", "ks_drift"]) == 0
    out = buf.getvalue()
    assert "ks_drift_binned" in out and "bm25_topk" not in out


def test_oracle_prints_sql():
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["oracle", "group_count"]) == 0
    assert "SELECT" in buf.getvalue().upper()


def test_unknown_query_suggests_close_names():
    err = io.StringIO()
    with redirect_stderr(err):
        assert main(["run", "minhash"]) == 2
    assert "minhash_lsh_pairs" in err.getvalue()
