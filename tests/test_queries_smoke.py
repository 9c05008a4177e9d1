"""Every declared query runs at sf0.001 and returns rows with a stable
schema.  (Value correctness is scripts/check_oracle.py + the driver.)"""

import pytest

import __spark_entry__ as entry_mod


@pytest.mark.parametrize("key", sorted(entry_mod.queries().keys()))
def test_query_runs_nonempty(spark, sf_dir, key):
    df = entry_mod.queries()[key](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"vec_id", "score", "rank"} <= set(df.columns)


def test_every_oracle_key_is_declared():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
