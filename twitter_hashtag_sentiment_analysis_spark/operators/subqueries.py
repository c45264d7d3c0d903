"""Subquery shapes: scalar, correlated-EXISTS, and IN-subquery with a
computed predicate — the Catalyst decorrelation surface.

Spark rewrites all three into joins (scalar -> broadcast of a 1-row
aggregate; EXISTS/IN -> semi joins), which is exactly what you want at
100 TB: a correlated subquery that re-executed per outer row would be
O(n*m); decorrelated it is one partial-agg + one semi join. The oracles
use the same subquery syntax, letting DuckDB's own decorrelator prove
the semantics match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "sub_scalar",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 1.5x the global mean price. The
    1-row aggregate is computed once and broadcast into the filter —
    expressed via spark.sql so Catalyst's ScalarSubquery node (not a
    hand-rolled collect()) does the plumbing; there is no driver-side
    constant in the Python layer."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM v_orders)
        """
    )


@register(
    "sub_exists_correlated",
    sql="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
)
def sub_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers with at least one large order.
    Catalyst decorrelates this into a left-semi hash join on the
    correlation key with the inner predicate pushed below the join —
    per-outer-row re-execution never happens."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_customer c
        WHERE EXISTS (
            SELECT 1 FROM v_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )


@register(
    "sub_in_agg",
    sql="""
        SELECT o_orderkey, o_custkey, o_orderdate
        FROM orders
        WHERE o_custkey IN (
            SELECT o_custkey FROM orders
            GROUP BY o_custkey HAVING count(*) >= 15
        )
    """,
)
def sub_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over an aggregated subquery: orders of frequent customers
    (>= 15 orders). Plans as aggregate -> left-semi join; the aggregate
    output (one row per qualifying customer) is the small side and
    broadcasts at any scale where the qualifying set fits memory."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderdate
        FROM v_orders
        WHERE o_custkey IN (
            SELECT o_custkey FROM v_orders
            GROUP BY o_custkey HAVING count(*) >= 15
        )
        """
    )


# One LATERAL text, two engines (same trick as analytics.PORTABLE_SQL)
LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.total_spent, t.n_orders
    FROM customer c, LATERAL (
        SELECT round(sum(o.o_totalprice), 2) AS total_spent,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o WHERE o.o_custkey = c.c_custkey
    ) t
    WHERE t.n_orders >= 1
"""


@register("sub_lateral", sql=LATERAL_SQL)
def sub_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-outer-row derived table
    (SQL:1999's answer to 'apply this subplan to each row'). Catalyst
    decorrelates it into an aggregate + equi-join exactly like the
    EXISTS forms above, so the naive O(outer x inner) re-execution
    never happens; DuckDB's decorrelator does the same, and both run
    the IDENTICAL SQL text. The aggregate-per-customer shape is the
    canonical use: enrich each entity with a computed rollup of its
    fact rows."""
    for name in ("orders", "customer"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(LATERAL_SQL)


@register(
    "sub_not_in_nulls",
    sql="""
        SELECT
            CAST((SELECT count(*) FROM customer
                  WHERE c_nationkey NOT IN
                        (SELECT nullif(s_nationkey, 13) FROM supplier))
                 AS BIGINT) AS n_with_null_inner,
            CAST((SELECT count(*) FROM customer
                  WHERE c_nationkey NOT IN
                        (SELECT nullif(s_nationkey, 13) FROM supplier
                         WHERE nullif(s_nationkey, 13) IS NOT NULL))
                 AS BIGINT) AS n_null_filtered
    """,
)
def sub_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULL-bearing subquery — ANSI three-valued logic's
    classic trap, pinned as an operator so the engine's semantics are
    adjudicated rather than assumed. ``x NOT IN (s)`` is
    ``x <> v1 AND x <> v2 AND ...``; one NULL element makes every
    conjunct UNKNOWN at best, so the first count is provably 0 rows
    no matter the data, while the IS NOT NULL-filtered twin returns
    the anti-join count users actually wanted. Catalyst plans the
    null-aware anti join as a dedicated operator
    (NullAwareHashedRelation) rather than a per-row re-scan — at
    100 TB the difference between this and a naive rewrite is a full
    O(n*m) pass. The fixture has no natural NULLs (measured), so the
    inner side synthesizes one via nullif on a present key."""
    for name in ("customer", "supplier"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT
            CAST((SELECT count(*) FROM customer
                  WHERE c_nationkey NOT IN
                        (SELECT nullif(s_nationkey, 13) FROM supplier))
                 AS BIGINT) AS n_with_null_inner,
            CAST((SELECT count(*) FROM customer
                  WHERE c_nationkey NOT IN
                        (SELECT nullif(s_nationkey, 13) FROM supplier
                         WHERE nullif(s_nationkey, 13) IS NOT NULL))
                 AS BIGINT) AS n_null_filtered
        """
    )


@register(
    "sub_any_all",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > ALL (
            SELECT o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
              AND o_custkey % 100 = 7
        )
        AND o_totalprice <= ANY (
            SELECT o_totalprice * 2 FROM orders WHERE o_orderpriority = '5-LOW'
              AND o_custkey % 100 = 7
        )
    """,
)
def sub_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (``> ALL`` / ``<= ANY``). Spark SQL has
    no ALL/ANY subquery syntax, so the engine expresses the ANSI
    semantics through the standard decorrelation identities —
    ``x > ALL (s)`` = ``x > (SELECT max(s))`` and ``x <= ANY (s)`` =
    ``x <= (SELECT max(s))`` on a non-empty NULL-free inner side
    (both measured properties of this inner relation) — turning each
    quantifier into a broadcast 1-row aggregate instead of a per-row
    scan. The oracle runs the genuine ALL/ANY syntax in DuckDB,
    proving the rewrite IS the ANSI semantics, not an approximation
    of it."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_qa")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders_qa
        WHERE o_totalprice > (
            SELECT max(o_totalprice) FROM v_orders_qa
            WHERE o_orderpriority = '1-URGENT' AND o_custkey % 100 = 7
        )
        AND o_totalprice <= (
            SELECT max(o_totalprice * 2) FROM v_orders_qa
            WHERE o_orderpriority = '5-LOW' AND o_custkey % 100 = 7
        )
        """
    )
