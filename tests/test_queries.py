"""Differential tests: a sample of registry queries vs DuckDB at sf0.001
(the full registry runs at sf0.01 via tools/check_oracles.py and the
grading driver)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
SAMPLE = [
    "range_filter",
    "in_set_pair",
    "dnf_selection",
    "two_hop_semi_join",
    "agg_q1",
    "dedup_exact",
    "token_count",
    "encode_roundtrip_documents",
]


@pytest.fixture(scope="module")
def harness(ray_session):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import check_oracles

    con = duckdb.connect()
    for t in check_oracles.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    import __ray_entry__ as e

    return check_oracles, con, e.queries(), e.oracle_sql()


@pytest.mark.parametrize("name", SAMPLE)
def test_query_vs_oracle(harness, name):
    check_oracles, con, qs, sqls = harness
    mine = check_oracles.to_df(qs[name](SF_DIR))
    oracle = con.execute(sqls[name]).df()
    assert len(mine) == len(oracle)
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert check_oracles.value_hash(mine) == check_oracles.value_hash(oracle)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    out = e.entry()
    assert isinstance(out, pd.DataFrame)
    assert len(out) >= 1
    assert {"partition_id", "n_rows", "raw_bytes", "enc_bytes"} <= set(out.columns)
