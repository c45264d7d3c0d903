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
