"""Window functions (SURVEY §2B).

Absent from the reference (no analytics at all); mandated surface.
Each window is a single shuffle on the partition key + one sort per
partition. Scale note: partition keys here (custkey, orderkey) have
cardinality that grows with data size, so partitions stay small and
skew-free at 100 TB; we deliberately avoid windowing over 3-value keys
like l_returnflag except where the frame semantics demand it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "win_rank",
    sql="""
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
               CAST(rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS drnk,
               CAST(ntile(4)     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS quartile,
               round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate), 6) AS prank
        FROM orders
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family. row_number/ntile use a fully-unique ordering
    (date, orderkey) for determinism; rank/dense_rank/percent_rank
    order by date alone so ties actually exercise their semantics."""
    o = table(spark, sf_dir, "orders")
    unique = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tied = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(unique).cast("long").alias("rn"),
        F.rank().over(tied).cast("long").alias("rnk"),
        F.dense_rank().over(tied).cast("long").alias("drnk"),
        F.ntile(4).over(unique).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(tied), 6).alias("prank"),
    )


@register(
    "win_lag_lead",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
               lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
               o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta
        FROM orders
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets over a unique ordering (null at partition edges)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - prev).alias("delta"),
    )


@register(
    "win_running_rows",
    sql="""
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
               round(sum(l_quantity) OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_extendedprice, l_quantity
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
               CAST(count(*) OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_extendedprice, l_quantity
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
        FROM lineitem
    """,
)
def win_running_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals with an explicit ROWS frame. Partition key is
    l_orderkey (≤7 rows per partition at any SF) — constant memory.

    (l_orderkey, l_linenumber) is NOT unique in the fixtures, so the
    ordering includes every output-relevant column: rows that still tie
    are fully identical, making the output multiset deterministic."""
    li = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_extendedprice", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_quantity",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        F.count("*").over(w).alias("n_so_far"),
    )


@register(
    "win_range_frame",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar,
               round(max(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) AS max_in_band
        FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per customer, peers within a $10k band
    below the current order's price. count/max are order-insensitive
    within the frame, so results are engine-independent."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar"),
        F.round(F.max("o_totalprice").over(w), 2).alias("max_in_band"),
    )


@register(
    "win_topk_group",
    sql="""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) t WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via rank-filter. Catalyst 3.5+/4.x rewrites this
    into WindowGroupLimit, pushing the k-limit below the sort so each
    partition keeps only k rows through the shuffle — the pattern that
    makes per-group top-k viable at 100 TB."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_first_last",
    sql="""
        SELECT o_orderkey, o_custkey, o_orderdate,
               first_value(o_orderdate) OVER w AS first_order,
               last_value(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_order,
               nth_value(o_orderdate, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value per customer. The subtle
    contract: last_value over the DEFAULT frame (unbounded preceding ..
    current row) is just the current row — the useful form needs the
    explicit full-partition frame, declared identically in both
    engines. Tie-broken by o_orderkey so nth is deterministic."""
    o = table(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.first("o_orderdate").over(wd).alias("first_order"),
        F.last("o_orderdate").over(wfull).alias("last_order"),
        F.nth_value("o_orderdate", 2).over(wfull).alias("second_order"),
    )


@register(
    "win_ntile_cume",
    sql="""
        SELECT c_custkey, c_mktsegment,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cum_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: ntile quartiles + percent_rank +
    cume_dist per market segment — the bucketing/normalization shape
    behind quality-score percentiles in a curation pipeline. ntile
    assigns by row position, so the ORDER BY carries a unique
    c_custkey tie-break (acctbal ties would otherwise make the
    quartile engine-dependent). One shuffle on the segment key serves
    all three functions (same window spec)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register(
    "win_ignore_nulls",
    sql="""
        WITH e AS (
            SELECT event_id, user_id, ts, event_type,
                   CASE WHEN event_type = 'purchase' THEN round(value, 2)
                        END AS purchase_value
            FROM events
        )
        SELECT event_id, user_id, event_type, purchase_value,
               last_value(purchase_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_purchase,
               nth_value(purchase_value, 2 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS second_purchase
        FROM e
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window family: carry-forward of the last non-null
    observation (last_value) and positional pick among non-nulls
    (nth_value) — the gap-fill / last-observation-carried-forward
    primitive of every sparse time series (sensor readings, sporadic
    purchases). A sparse column is derived deterministically (value
    only on purchase events); carry-forward is PER USER — partitioning
    by the entity key is both the correct LOCF semantics and what keeps
    the window parallel (a global ORDER BY window is a single-partition
    sort at 100 TB). Frame is running-rows, so state per partition is
    O(1). Dialect note: Spark takes ignoreNulls as a function argument,
    DuckDB as the SQL-standard IGNORE NULLS clause — same semantics,
    pinned by the oracle hash."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.round("value", 2)).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "purchase_value",
        F.last("purchase_value", ignorenulls=True).over(w).alias("last_purchase"),
        F.nth_value("purchase_value", 2, ignoreNulls=True)
        .over(w)
        .alias("second_purchase"),
    )


# One INTERVAL-range window text, two engines (the portable-SQL trick)
TIME_RANGE_SQL = """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           round(sum(value) OVER w, 2) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@register("win_time_range", sql=TIME_RANGE_SQL)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based RANGE frame: per user, a rolling trailing-1-hour
    count/sum keyed by EVENT TIME, not row position — the sliding-
    window aggregate without exploding one row per window (compare
    stream_sliding, which materializes window starts). The frame is
    evaluated in one sort per partition with a moving pointer: O(n)
    per user regardless of event density. Both engines run the
    identical SQL text (count/sum are order-insensitive inside the
    frame, so ts ties cannot diverge)."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(TIME_RANGE_SQL)


@register(
    "win_running_distinct",
    sql="""
        WITH firsts AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CASE WHEN row_number() OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) = 1
                        THEN 1 ELSE 0 END AS is_first
            FROM events
        ),
        daily AS (
            SELECT day, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(is_first) AS BIGINT) AS n_new_users
            FROM firsts GROUP BY day
        )
        SELECT day, n_events, n_new_users,
               CAST(sum(n_new_users) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_distinct_users
        FROM daily
        ORDER BY day
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT-user count per day — the window no engine's
    frame syntax can express (COUNT(DISTINCT) OVER a running frame is
    unsupported in Spark and DuckDB alike, and a naive emulation
    re-scans every prefix: quadratic). Decomposed into three linear
    steps: (1) a per-user row_number window marks each user's FIRST
    event (one shuffle on user_id); (2) a daily aggregate counts
    events and first-occurrences (tiny); (3) a cumulative sum over the
    ~365-row daily series turns new-user counts into the running
    distinct total — correct because every user is counted exactly
    once, on their first day. At 100 TB step (1) is the only
    data-sized shuffle and steps (2)-(3) operate on a calendar-bounded
    relation; the deterministic (ts, event_id) tie-break pins which
    event is 'first' so both engines agree exactly."""
    d = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = d.select(
        F.to_date("ts").alias("day"),
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    daily = firsts.groupBy("day").agg(
        F.count("*").alias("n_events"),
        F.sum("is_first").alias("n_new_users"),
    )
    w_cum = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        "n_events",
        "n_new_users",
        F.sum("n_new_users").over(w_cum).alias("running_distinct_users"),
    ).orderBy("day")


@register(
    "win_pareto_share",
    sql="""
        WITH cust_rev AS (
            SELECT o_custkey,
                   CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT)
                       AS rev_cents
            FROM orders GROUP BY o_custkey
        ),
        located AS (
            SELECT n.n_name AS nation, r.o_custkey, r.rev_cents
            FROM cust_rev r
            JOIN customer c ON r.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        ranked AS (
            SELECT nation, o_custkey, rev_cents,
                   CAST(row_number() OVER w AS BIGINT) AS rk,
                   sum(rev_cents) OVER (PARTITION BY nation
                       ORDER BY rev_cents DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cents,
                   sum(rev_cents) OVER (PARTITION BY nation) AS tot_cents
            FROM located
            WINDOW w AS (PARTITION BY nation
                         ORDER BY rev_cents DESC, o_custkey)
        )
        SELECT nation, rk, o_custkey,
               round(rev_cents / 100.0, 2) AS revenue,
               round(1.0 * cum_cents / tot_cents, 6) AS cum_share
        FROM ranked WHERE rk <= 5
    """,
)
def win_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto) per nation: customers ranked by
    revenue inside their nation with the running share of national
    revenue — 'how top-heavy is each market'. The window is PARTITIONED
    by nation, never global (a whole-corpus Pareto would order every
    customer through one partition; per-group concentration is the
    scale-safe form, and the cross-market comparison happens across the
    group rows). Revenue is summed in integer CENTS (explicit half-up
    floor form), so the running sum is exact integer arithmetic — the
    cumulative total cannot drift by summation order — and shares are
    one rounded division per row. The rk <= 5 cut prunes OUTPUT rows
    only — the running share needs the complete frame, so the
    per-nation sort is full by design (contrast win_topk_group, where
    no running aggregate exists and WindowGroupLimit truncates early);
    both dimension joins broadcast (plan-asserted)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cust_rev = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("rev_cents")
    )
    located = (
        cust_rev.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            cust_rev.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), "o_custkey", "rev_cents")
    )
    w_ord = Window.partitionBy("nation").orderBy(
        F.col("rev_cents").desc(), "o_custkey"
    )
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("nation")
    ranked = located.select(
        "nation",
        "o_custkey",
        "rev_cents",
        F.row_number().over(w_ord).cast("long").alias("rk"),
        F.sum("rev_cents").over(w_run).alias("cum_cents"),
        F.sum("rev_cents").over(w_all).alias("tot_cents"),
    )
    return ranked.filter(F.col("rk") <= 5).select(
        "nation",
        "rk",
        "o_custkey",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(F.lit(1.0) * F.col("cum_cents") / F.col("tot_cents"), 6).alias(
            "cum_share"
        ),
    )


#: Rolling-median frame width (rows, trailing inclusive).
ROLLMED_K = 15


@register(
    "win_rolling_median",
    sql=f"""
        SELECT event_id, user_id, ts, value,
               quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLLMED_K - 1} PRECEDING AND CURRENT ROW)
                   AS rolling_median
        FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median of the trailing ROLLMED_K events per user — the
    robust smoother a metrics pipeline uses where the rolling MEAN
    (ts_anomaly_zscore's mu) is outlier-sensitive. An order-statistic
    over a rows-bounded frame: state per key is O(K) regardless of
    history, one user-keyed sort serves the whole query (shuffle-free
    on a user-bucketed store). Spark's `percentile` and DuckDB's
    `quantile_cont` share the interpolated definition, and an order
    statistic needs no rounding: the frame CONTENTS are identical row
    sets, the median is picked/interpolated from the same two doubles
    — bit-identical without any float-sum ordering concern."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLMED_K - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr("percentile(value, 0.5)").over(w).alias("rolling_median"),
    )


WINDOW_CLAUSE_SQL = """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           round(sum(o_totalprice) OVER w, 2) AS running_spend,
           round(avg(o_totalprice) OVER w, 6) AS running_avg,
           CAST(count(*) OVER w AS BIGINT) AS n_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("sql_window_clause", sql=WINDOW_CLAUSE_SQL)
def sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named ``WINDOW`` clause (SQL:2003): one spec declared once,
    referenced by four window functions — the deduplication surface
    that keeps real reporting SQL maintainable (change the ordering in
    ONE place) and, in the plan, guarantees all four functions share a
    single Window operator over a single sort instead of risking four
    textually-divergent specs. SAME SQL text on both engines (the
    analytics.PORTABLE_SQL discipline); the unique (o_orderdate,
    o_orderkey) tie-break + ROWS frame keep running sums deterministic
    cross-engine. One shuffle on o_custkey serves everything."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(WINDOW_CLAUSE_SQL)


@register(
    "win_gaps_islands",
    sql="""
        WITH months AS (
            SELECT DISTINCT o_custkey,
                   CAST(date_part('year', o_orderdate) * 12
                        + date_part('month', o_orderdate) - 1 AS BIGINT)
                       AS m
            FROM orders
        ),
        grp AS (
            SELECT o_custkey, m,
                   m - dense_rank() OVER (PARTITION BY o_custkey ORDER BY m)
                       AS island_key
            FROM months
        ),
        islands AS (
            SELECT o_custkey, island_key,
                   CAST(count(*) AS BIGINT) AS island_len,
                   CAST(min(m) AS BIGINT) AS start_m
            FROM grp GROUP BY 1, 2
        )
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_islands,
               CAST(max(island_len) AS BIGINT) AS longest_streak_months,
               CAST(sum(island_len) AS BIGINT) AS active_months,
               CAST(min(start_m) AS BIGINT) AS first_month_idx
        FROM islands
        GROUP BY o_custkey
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each customer's active order-months
    into maximal runs of CONSECUTIVE months (islands), reporting run
    count, longest streak, total active months, and first activity.
    The classic window identity does all the work without a self-join
    or recursion: within a customer, month_index − dense_rank(month)
    is CONSTANT exactly across a consecutive run and distinct between
    runs, so one window + one aggregate finds every island. This is
    the subscription/engagement-streak primitive (months billed
    consecutively, weeks trained without a break, …).

    Scale shape: the DISTINCT collapses the fact table to (customer,
    month) grain first — calendar-bounded per customer; the window
    partitions by customer (no global sort) and both aggregates share
    that partitioning, so the whole operator is one shuffle on
    o_custkey after the distinct's. Integer month indices and counts
    end-to-end — nothing to round, hash-stable by construction."""
    o = table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    grp = months.select(
        "o_custkey",
        "m",
        (F.col("m") - F.dense_rank().over(w)).alias("island_key"),
    )
    islands = grp.groupBy("o_custkey", "island_key").agg(
        F.count("*").cast("long").alias("island_len"),
        F.min("m").cast("long").alias("start_m"),
    )
    return islands.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.max("island_len").cast("long").alias("longest_streak_months"),
        F.sum("island_len").cast("long").alias("active_months"),
        F.min("start_m").cast("long").alias("first_month_idx"),
    )


@register(
    "win_reset_running_sum",
    sql="""
        WITH seg AS (
            SELECT event_id, user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   event_type,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS seg_id
            FROM events
        )
        SELECT event_id, user_id, CAST(seg_id AS BIGINT) AS seg_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN cents ELSE 0 END)
                    OVER (PARTITION BY user_id, seg_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
                   AS spend_since_signup_cents
        FROM seg
    """,
)
def win_reset_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resettable running sum — 'purchase spend since the user's most
    recent signup': a cumulative metric whose accumulator RESETS at
    marker events, the segmented-window primitive behind 'since last
    deploy/deposit/login' dashboards. Two stacked windows express it
    without a join or a UDF: a conditional running count of markers
    assigns each row a segment id (the gaps-and-islands cousin), and
    the value cumsum partitions by (user, segment), so crossing a
    marker starts a fresh accumulator.

    Exactness: cents are exact integers, the (ts, event_id) order is
    total, and both windows are integer arithmetic — hash-stable.
    Scale shape: both windows partition by user_id and share ONE sort
    (the second adds seg_id, a prefix-compatible key), so the plan is
    one exchange + one sort regardless of corpus size; no global
    window anywhere."""
    e = table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_seg = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_type",
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        )
        .over(w_seg)
        .alias("seg_id"),
    )
    w_run = (
        Window.partitionBy("user_id", "seg_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seg.select(
        "event_id",
        "user_id",
        F.col("seg_id").cast("long").alias("seg_id"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(
                0
            )
        )
        .over(w_run)
        .cast("long")
        .alias("spend_since_signup_cents"),
    )


_GROUPS_FRAME_SQL = """
    WITH days AS (
        SELECT user_id, event_id,
               CAST(date_trunc('day', ts) AS DATE) AS day, value
        FROM events
    ),
    dr AS (
        SELECT user_id, event_id, day, value,
               dense_rank() OVER (
                   PARTITION BY user_id ORDER BY day) AS grp_rank
        FROM days
    )
    SELECT user_id, event_id, day, value,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY grp_rank
               RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 6) AS grp_sum,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY grp_rank
               RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS grp_cnt
    FROM dr
"""


@register("win_groups_frame", sql=_GROUPS_FRAME_SQL)
def win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 GROUPS window frame (peer-group framing), which BOTH
    engines lack natively (probed 2026-08-17: Spark 4.1 PARSE_SYNTAX_
    ERROR, DuckDB 'GROUPS mode ... not implemented yet') — so the
    engine FILLS the surface as a composition: ``GROUPS BETWEEN 1
    PRECEDING AND CURRENT ROW`` == dense_rank() over the ORDER key,
    then an integer RANGE frame over that rank. Per user, ordered by
    event DAY (ties = the peer groups), the frame aggregates the
    current day's peers plus the full previous distinct day —
    semantics ROWS frames cannot express (peer sets vary per row) and
    RANGE-over-day only matches when days are contiguous (GROUPS steps
    by DISTINCT value, skipping gaps). The oracle replays the same
    composition (the unrolled-equivalence discipline: both engines run
    the identical well-defined expansion). Scale: ONE shuffle on
    user_id; both windows share the partitioning, and ordering by
    grp_rank is ordering by day, so the second sort is a no-op pass
    over already-sorted runs. round(6) absorbs float sum ulp.
    Output: (user_id, event_id, day, value, grp_sum, grp_cnt)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "value",
    )
    ranked = e.withColumn(
        "grp_rank",
        F.dense_rank().over(Window.partitionBy("user_id").orderBy("day")),
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("grp_rank")
        .rangeBetween(-1, Window.currentRow)
    )
    return ranked.select(
        "user_id",
        "event_id",
        "day",
        "value",
        F.round(F.sum("value").over(frame), 6).alias("grp_sum"),
        F.count(F.lit(1)).over(frame).alias("grp_cnt"),
    )
