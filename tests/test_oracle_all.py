"""Differential test: every registered operator vs its DuckDB oracle.

This is the local mirror of the driver's CORRECTNESS gate (exact value
compare, not a tolerance). Parametrized over the registry so newly added
operators are covered automatically.
"""

from __future__ import annotations

import pytest

from kinesis_datastore_app_spark import registry
from tests.oracle_harness import run_check

registry.load_all()
ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_operator_vs_oracle(spark, sf_dir, key):
    run_check(spark, key, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 3


def test_every_oracle_key_has_query():
    assert set(registry.ORACLE) <= set(registry.QUERIES)
