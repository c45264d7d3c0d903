"""Physical-plan inspection helpers.

The scale contract of this engine is enforced as plan-shape assertions
(tests/test_plans.py): broadcast where a side is small, pushed filters
and pruned read schemas, WindowGroupLimit for grouped top-k, no shuffle
between identically-bucketed scans. These helpers render a query's
physical plan as text so those properties can be asserted.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession

from ..registry import load_all


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string instead of stdout."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_of(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Formatted physical plan of a registered query."""
    return explain_str(load_all()[name].fn(spark, sf_dir))
