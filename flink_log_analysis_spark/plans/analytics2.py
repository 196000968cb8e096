"""Analytics surface, part 2: cube, window frames, quantiles,
correlated-subquery shapes, and approximate sketches.

Same determinism rules as :mod:`.analytics` (exact decimal sums,
rounded-double divisions, total tie-break orders). The Q17-shaped
threshold compare is kept *exact* by clearing denominators:
``qty < 0.2 * avg(qty)``  ⇔  ``5 * qty * cnt < sum_qty`` — integer/
decimal arithmetic on both engines, no float boundary flakiness.

Scale notes: the moving-average and market-share windows partition on
low-cardinality keys after pre-aggregation, so window state is tiny;
the Q17 join is an agg-then-broadcast of per-part thresholds (the
classic rewrite that avoids recomputing the correlated subquery per
row); sketches (HLL / KLL) are the 100 TB cardinality/quantile answer
— single pass, mergeable, no exact distinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_table
from .analytics import DEC, _dec, _money


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE(status, priority): all grouping-set combinations."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money(F.sum(_dec("o_totalprice"))).alias("revenue"),
    )


def monthly_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame over pre-aggregated months: 3-month trailing mean.

    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW over ~tens of rows after
    the group-by — frame evaluation never sees raw fact rows.
    """
    o = read_table(spark, sf_dir, "orders")
    # month stays TIMESTAMP (Spark's date_trunc output); the oracle
    # CASTs DuckDB's DATE to TIMESTAMP so both engines emit the same
    # logical type (DATE hashes differently through pandas).
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        _money(F.sum(_dec("o_totalprice"))).alias("revenue")
    )
    w = Window.orderBy("month").rowsBetween(-2, 0)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.avg("revenue").over(w), 4).alias("trailing3_avg"),
    )


def quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag.

    ``percentile`` (Spark) and ``quantile_cont`` (DuckDB) both use
    linear interpolation on the sorted values; rounding to 4 absorbs
    any last-ulp difference in the interpolation arithmetic.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity (correlated subquery ->
    agg + join rewrite; threshold compare exact via 5*qty*cnt < sum)."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    joined = li.join(per_part, li.l_partkey == per_part.pk)
    below = joined.filter(
        _dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return below.agg(
        _money(F.sum(_dec("l_extendedprice"))).alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of each nation within its region (window over a
    pre-aggregated 25-row frame; dims broadcast onto the fact agg)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(_dec("o_totalprice")).alias("rev_dec"))
    )
    # window-sum in exact decimal (double window sums are
    # accumulation-order-dependent); one double division at the end
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        _money(F.col("rev_dec")).alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double"),
            4,
        ).alias("share"),
    )


def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window: per-customer mean days between consecutive orders
    (exact integer day diffs, one rounded division per customer)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_days").cast("bigint").alias("total_gap_days"),
            F.round(F.sum("gap_days") / F.count(F.lit(1)), 4).alias("avg_gap_days"),
        )
        .filter(F.col("n_gaps") >= 3)
    )


def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue by (supplier nation -> customer nation).

    The engine's fact-fact join: lineitem ⨝ orders shuffles on
    orderkey (the one unavoidable shuffle; AQE handles skew/coalesce),
    while supplier/customer/nation stay broadcast. Cross-nation flows
    only (supp != cust nation) to keep the result discriminative.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            _money(F.sum(rev), scale=2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def last_purchase_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each event annotated with the user's latest
    purchase at-or-before the event time.

    Spark has no native ASOF JOIN — this runs the union+window
    composition (operators/asof.py, one keyed-window shuffle, no
    range cross-product) and is checked against DuckDB's *native*
    ``ASOF JOIN``: two independent algorithms, one result.
    """
    from ..operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .withColumn("purchase_ts", F.col("ts"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        key="user_id",
        ts="ts",
        payload_cols=["purchase_value", "purchase_ts"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "event_type",
        "purchase_value", "purchase_ts",
    )


EVENT_TYPES = ("view", "click", "purchase", "error")


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user, one count column per event type.

    Spark's ``pivot`` with an explicit value list compiles to a single
    hash aggregate with conditional counts — no extra shuffle vs the
    plain group-by (the explicit list also avoids the
    distinct-values discovery pass, which matters at scale).
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .select(
            "user_id",
            *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


def order_value_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window breadth: NTILE quartiles + percent_rank per
    order status (deterministic total order).

    o_orderstatus has THREE values, so ``Window.partitionBy(status)``
    would funnel ~1/3 of all orders through each of three tasks — a
    straggler at 100x data. Instead the exact per-status rank comes
    from operators.ranking.distributed_rank (range partition +
    per-group offsets, every task bounded by partition size), and
    ntile/percent_rank are arithmetic on (rank, group size) — output
    identical to the window formulation (oracle-checked).
    """
    from ..operators.ranking import (
        distributed_rank,
        ntile_expr,
        percent_rank_expr,
    )

    o = read_table(spark, sf_dir, "orders")
    ranked = distributed_rank(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        partition_cols=["o_orderstatus"],
        order_cols=["o_totalprice", "o_orderkey"],
        rank_col="_rn",
        size_col="_n",
    )
    return ranked.select(
        "o_orderkey",
        "o_orderstatus",
        ntile_expr(F.col("_rn"), F.col("_n"), 4).alias("quartile"),
        F.round(percent_rank_expr(F.col("_rn"), F.col("_n")), 6).alias(
            "pct_rank"
        ),
    )


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows in batch: per-user 30-min-gap sessions
    via ``F.session_window`` — the built-in operator behind
    ``streaming.stateful.session_counts`` (same expression +
    watermark runs streaming).

    Spark merges events whose windows overlap: an event extends a
    session iff its time is strictly before last_event + gap, and the
    emitted window is [first_event, last_event + gap). The oracle
    re-derives sessions independently (LAG + running-sum grouping on
    epoch microseconds — the exact integer domain Spark aggregates
    in after the nanos→micros normalization), so two different
    algorithms must agree bit-for-bit. Epoch-µs output columns keep
    timestamp hashing engine-neutral.
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("session_hits"),
            _money(F.sum(F.col("value").cast(DEC))).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "session_hits",
            "session_value",
        )
    )


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct + quantile sketches — the single-pass
    100 TB substitutes for exact distinct counts and sorts.

    NOT a registry entry: HLL++/KLL sketch internals differ across
    engines, so raw sketch values can never hash-match a DuckDB oracle
    — a permanently unverifiable registry row. The driver-checked form
    of this component is ``sketch_accuracy`` below, which runs the
    same sketches next to their exact answers and emits deterministic
    bounds-as-booleans. This function stays as the plain operator
    (tests/test_analytics2.py bounds its relative error directly).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


PROFILE_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-collection over lineitem: exact row/null/distinct counts
    per column in ONE scan (operators/profiling.py — the multi-distinct
    Expand plan), vs k separate scans at 100 TB."""
    from ..operators.profiling import profile_columns

    li = read_table(spark, sf_dir, "lineitem")
    return profile_columns(li, PROFILE_COLS)


# Error floor the sketch contract asserts (generous vs the configured
# rsd=0.02 so a healthy sketch never trips it; column names derive from
# the constant so they cannot drift).
SKETCH_REL_ERR = 0.05
_BOUND = f"within_{int(SKETCH_REL_ERR * 100)}pct"


def sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable contract for the engine-specific sketches
    (same pattern as llm_similarity.knn_ivf_recall): exact distinct
    counts are SQL-derivable and hash-compared, and each sketch must
    land within SKETCH_REL_ERR of its exact answer — the row goes red
    the moment a sketch config change breaks the accuracy contract,
    while the sketch internals stay engine-specific (HLL++/KLL bits
    are deliberately NOT part of the contract).
    """
    li = read_table(spark, sf_dir, "lineitem")
    # One agg per exact distinct: two countDistinct on DIFFERENT keys
    # (plus a percentile) in a single Aggregate forces an Expand that
    # replicates every input row once per distinct group — measured
    # 19s vs ~2s at sf0.1. Separate single-purpose aggregates each
    # stay a plain partial+final hash agg over one pruned column; the
    # 1-row results then join as broadcast scalars (the bm25
    # corpus-stats attach pattern).
    exact_orders = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    exact_parts = li.agg(F.countDistinct("l_partkey").alias("n_parts"))
    exact_median = li.agg(
        F.expr("percentile(l_extendedprice, 0.5D)").alias("exact_median")
    )
    sketches = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a_median"),
    )
    agg = (
        exact_orders.crossJoin(exact_parts)
        .crossJoin(exact_median)
        .crossJoin(sketches)
    )

    def within(approx, exact):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= SKETCH_REL_ERR
        )

    return agg.select(
        "n_orders",
        "n_parts",
        within(F.col("a_orders"), F.col("n_orders")).alias(f"orders_{_BOUND}"),
        within(F.col("a_parts"), F.col("n_parts")).alias(f"parts_{_BOUND}"),
        within(F.col("a_median"), F.col("exact_median")).alias(
            f"median_{_BOUND}"
        ),
    )


ORACLE: dict[str, str] = {
    "orders_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "monthly_revenue_moving_avg": """
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                       AS month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               ROUND(AVG(revenue) OVER (
                   ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 4) AS trailing3_avg
        FROM m
    """,
    "quantity_quantiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
               ROUND(quantile_cont(l_quantity, 0.5), 4)  AS q50,
               ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "small_quantity_revenue": """
        WITH p AS (
            SELECT l_partkey AS pk,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS small_qty_revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN p ON l.l_partkey = p.pk
        WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * p.cnt < p.sum_qty
    """,
    "nation_market_share": """
        WITH rev AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        )
        SELECT region, nation, CAST(rev_dec AS DOUBLE) AS revenue,
               ROUND(CAST(rev_dec AS DOUBLE) /
                     CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE),
                     4) AS share
        FROM rev
    """,
    "customer_order_cadence": """
        WITH g AS (
            SELECT o_custkey,
                   date_diff('day',
                       lag(o_orderdate) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
            FROM orders
        )
        SELECT o_custkey, COUNT(*) AS n_gaps,
               CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
               ROUND(CAST(SUM(gap_days) AS DOUBLE) / COUNT(*), 4)
                   AS avg_gap_days
        FROM g WHERE gap_days IS NOT NULL
        GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
    "nation_trade_flows": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2
    """,
    "last_purchase_asof": """
        WITH p AS (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        p2 AS (SELECT user_id, ts, purchase_value, ts AS purchase_ts FROM p)
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               p2.purchase_value, p2.purchase_ts
        FROM events e
        ASOF LEFT JOIN p2
          ON e.user_id = p2.user_id AND e.ts >= p2.ts
    """,
    "user_event_pivot": """
        SELECT user_id,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   ::BIGINT AS n_view,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   ::BIGINT AS n_click,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   ::BIGINT AS n_purchase,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   ::BIGINT AS n_error
        FROM events GROUP BY user_id
    """,
    "order_value_ntile": """
        SELECT o_orderkey, o_orderstatus,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    # Session-window boundary: Spark opens a new session iff
    # diff >= gap (window intervals are half-open), hence >= below.
    "session_windows": """
        WITH seq AS (
            SELECT user_id, event_id, epoch_us(ts) AS us, value,
                   LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_us
            FROM events
        ), grp AS (
            SELECT user_id, us, value,
                   SUM(CASE WHEN prev_us IS NULL
                                 OR us - prev_us >= 1800 * 1000000
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id
                       ORDER BY us ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM seq
        )
        SELECT user_id,
               MIN(us) AS session_start_us,
               MAX(us) + 1800 * 1000000 AS session_end_us,
               COUNT(*) AS session_hits,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS session_value
        FROM grp GROUP BY user_id, sid
    """,
}

ORACLE["sketch_accuracy"] = f"""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           TRUE AS orders_{_BOUND},
           TRUE AS parts_{_BOUND},
           TRUE AS median_{_BOUND}
    FROM lineitem
"""

ORACLE["table_profile"] = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS "column",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM lineitem
    """
    for c in PROFILE_COLS
)

QUERIES = {
    "orders_cube": orders_cube,
    "monthly_revenue_moving_avg": monthly_revenue_moving_avg,
    "quantity_quantiles": quantity_quantiles,
    "small_quantity_revenue": small_quantity_revenue,
    "nation_market_share": nation_market_share,
    "customer_order_cadence": customer_order_cadence,
    "nation_trade_flows": nation_trade_flows,
    "last_purchase_asof": last_purchase_asof,
    "user_event_pivot": user_event_pivot,
    "order_value_ntile": order_value_ntile,
    "session_windows": session_windows,
    # approx_sketches is deliberately NOT registered: raw sketch values
    # are engine-specific and can never hash-match an oracle.
    # sketch_accuracy is the driver-checked (and benched) form.
    "sketch_accuracy": sketch_accuracy,
    "table_profile": table_profile,
}
