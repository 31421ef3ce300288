"""Fixture-vintage guard: the driver regenerates /root/testdata between
rounds (it has changed events.ts's physical type and row-group layout
before). Every engine query assumes the logical schemas below — pinned
from the 2026-08-14 vintage — so when a regeneration changes one, THIS
test should be the first red, naming the table and column, rather than a
cryptic failure deep inside an operator or a silent oracle divergence."""

from __future__ import annotations

import pytest

from kinesis_datastore_app_spark.catalog import TABLES, table

from .conftest import SF_ORACLE

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # events.ts is TIMESTAMP(NANOS) on disk; catalog.table normalizes it
    # to micros TIMESTAMP (see catalog.py) — assert the normalized form.
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_fixture_schema_vintage(spark, name):
    got = dict(table(spark, SF_ORACLE, name).dtypes)
    for col, typ in EXPECTED[name].items():
        assert col in got, (
            f"{name}.{col} missing — the driver regenerated the fixture "
            f"with a changed schema; re-audit every query touching {name}"
        )
        assert got[col] == typ, (
            f"{name}.{col} is now {got[col]} (expected {typ}) — fixture "
            f"vintage changed; re-run tools/sweep.py before trusting results"
        )
