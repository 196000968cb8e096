"""Contract queries for the batch MERGE operator and the custom
stateful sessionizer.

``customer_balance_merge`` exercises every MERGE clause
(matched-update with cross-side expressions, conditional
matched-delete, conditional not-matched-insert) in one deterministic
keyed-state result; the oracle re-derives it as a FULL OUTER JOIN +
CASE, i.e. by a *different* formulation of the same semantics.

``stateful_sessions`` runs the ``applyInPandasWithState`` sessionizer
(``streaming/stateful.py`` — the Spark shape of Flink's
KeyedProcessFunction + timers, SURVEY §2.A) through a real
availableNow file stream. Determinism: availableNow with
``maxFilesPerTrigger`` unset plans every initial file into ONE batch
(so the operator sees each key's full, sorted history), and the run
disables the processing-time timer (``use_timeout=False`` — pending
timers would also keep an availableNow query alive forever), so the
output is exactly the gap-closed sessions. That closed-form output is fully
SQL-expressible — the oracle rebuilds sessions with LAG + running-sum
grouping in the same truncated-millisecond domain the operator
computes in, then drops each key's final (still-open) session.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_into
from ..session import (
    STREAM_STATE_PARTITIONS,
    read_table,
    scoped_conf,
    shared_tmp_dir,
)
from ..streaming.stateful import sessionize_with_state
from .analytics import _dec


def customer_balance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO keyed customer state USING per-customer order totals.

    Target: odd-keyed customers' account balances (so even-keyed
    customers with orders exercise the INSERT arm). Source: per-customer
    order revenue + counts. Clauses:

      WHEN MATCHED AND s.n_orders > 20 THEN DELETE
      WHEN MATCHED THEN UPDATE SET balance = t.balance + s.balance,
                                   n_orders = s.n_orders
      WHEN NOT MATCHED AND s.n_orders >= 2 THEN INSERT *

    One full-outer shuffle join on custkey — see operators/merge.py.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    target = cust.filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("custkey"),
        _dec("c_acctbal").cast("decimal(30,2)").alias("balance"),
        F.lit(0).cast("bigint").alias("n_orders"),
    )
    source = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(_dec("o_totalprice")).cast("decimal(30,2)").alias("balance"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    merged = merge_into(
        target,
        source,
        ["custkey"],
        update_set={
            "balance": F.col("t.balance") + F.col("s.balance"),
            "n_orders": F.col("s.n_orders"),
        },
        matched_delete=F.col("s.n_orders") > 20,
        insert=True,
        insert_condition=F.col("s.n_orders") >= 2,
    )
    # engine-neutral output types (see plans/analytics.py docstring)
    return merged.select(
        "custkey",
        F.col("balance").cast("double").alias("balance"),
        "n_orders",
    )


def stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-closed per-user sessions from the custom stateful operator,
    driven through a genuine file stream (single-batch availableNow).

    Output stays executor-side end to end: the sink writes each batch
    straight to parquet (no driver collect — sink volume is
    O(sessions), which at 100 TB is far beyond driver memory), and
    ``emit_epoch_ms`` keeps session bounds as timezone-neutral longs.
    The result is materialized before the temp dir is removed.
    """
    from ..streaming.stateful import SESSION_OUTPUT_SCHEMA_MS

    work = shared_tmp_dir("loganalysis_sessions_")
    try:
        # Shared events snapshot (written once per sf_dir, see
        # plans/streamed.py) with the key/ts projection applied on the
        # streaming DataFrame — a stateless column map, so it runs
        # inside the stream's scan stage. Determinism needs ONE BATCH
        # (each key's full history at once), not one file: availableNow
        # with maxFilesPerTrigger unset plans all initial files into a
        # single batch, and the operator sorts each key's rows.
        from .streamed import read_events_stream

        stream = read_events_stream(spark, sf_dir).select(
            F.col("user_id").cast("string").alias("clientIP"),
            F.col("ts").alias("accessTs"),
        )
        # use_timeout=False: pending processing-time timers would keep
        # the availableNow query alive forever (see stateful.py)
        sess = sessionize_with_state(
            stream, gap_seconds=1800, use_timeout=False, emit_epoch_ms=True
        )
        out_dir = f"{work}/sessions"
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                sess.writeStream.outputMode("append")
                .foreachBatch(
                    lambda df, bid: df.write.mode("append").parquet(out_dir)
                )
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(timeout=600):
                q.stop()
                raise TimeoutError("sessionize stream did not drain in 600s")
        if not os.path.exists(out_dir):
            return spark.createDataFrame([], SESSION_OUTPUT_SCHEMA_MS)
        # The temp dir is deleted on return — localCheckpoint pins the
        # result in executor storage (never on the driver) before its
        # backing files disappear.
        return spark.read.parquet(out_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# Deterministic "next snapshot" of orders for the CDC diff: drop keys
# divisible by 97, bump totalprice on keys divisible by 89, insert
# shifted copies of keys divisible by 83. The oracle rebuilds both
# snapshots with the same rules and re-derives the diff with its own
# FULL OUTER join — it checks the operator, not the mutation rules.
DIFF_DEL_MOD = 97
DIFF_UPD_MOD = 89
DIFF_INS_MOD = 83
DIFF_INS_SHIFT = 10_000_000


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import snapshot_diff

    old = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    surv = old.filter(F.col("o_orderkey") % DIFF_DEL_MOD != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % DIFF_UPD_MOD == 0,
            F.col("o_totalprice") + 1,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    ins = old.filter(F.col("o_orderkey") % DIFF_INS_MOD == 0).select(
        (F.col("o_orderkey") + DIFF_INS_SHIFT).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    return snapshot_diff(old, surv.unionByName(ins), ["o_orderkey"])


ORACLE = {
    "orders_snapshot_diff": f"""
        WITH old AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        ), surv AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {DIFF_UPD_MOD} = 0
                        THEN o_totalprice + 1 ELSE o_totalprice END
                       AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % {DIFF_DEL_MOD} <> 0
        ), neu AS (
            SELECT * FROM surv
            UNION ALL
            SELECT o_orderkey + {DIFF_INS_SHIFT}, o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % {DIFF_INS_MOD} = 0
        ), j AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                   CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                        WHEN n.o_orderkey IS NULL THEN 'deleted'
                        WHEN NOT (o.o_totalprice
                                      IS NOT DISTINCT FROM n.o_totalprice
                                  AND o.o_orderstatus
                                      IS NOT DISTINCT FROM n.o_orderstatus)
                             THEN 'updated' END AS change
            FROM old o FULL OUTER JOIN neu n
              ON o.o_orderkey = n.o_orderkey
        )
        SELECT o_orderkey, change FROM j WHERE change IS NOT NULL
    """,
    "customer_balance_merge": """
        WITH t AS (
            SELECT c_custkey AS custkey,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(30,2))
                       AS balance,
                   CAST(0 AS BIGINT) AS n_orders
            FROM customer WHERE c_custkey % 2 = 1
        ), s AS (
            SELECT o_custkey AS custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(30,2)) AS balance,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT COALESCE(t.custkey, s.custkey) AS custkey,
               CAST(CASE
                   WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                       THEN t.balance + s.balance
                   WHEN s.custkey IS NULL THEN t.balance
                   ELSE s.balance
               END AS DOUBLE) AS balance,
               CAST(CASE
                   WHEN s.custkey IS NULL THEN t.n_orders
                   ELSE s.n_orders
               END AS BIGINT) AS n_orders
        FROM t FULL OUTER JOIN s ON t.custkey = s.custkey
        WHERE NOT (t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                   AND s.n_orders > 20)
          AND NOT (t.custkey IS NULL AND s.n_orders < 2)
    """,
    # Same > gap split and ms truncation as the pandas fn
    # (ns // 1e6 == epoch_us // 1000 for post-epoch data); each key's
    # last session is still open when the finite stream ends, so only
    # sid < max(sid) sessions were gap-closed.
    "stateful_sessions": """
        WITH e AS (
            SELECT CAST(user_id AS VARCHAR) AS key, event_id,
                   epoch_us(ts) // 1000 AS ms
            FROM events
        ), seq AS (
            SELECT key, ms, event_id,
                   LAG(ms) OVER (PARTITION BY key
                                 ORDER BY ms ASC, event_id ASC) AS prev_ms
            FROM e
        ), grp AS (
            SELECT key, ms,
                   SUM(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY key
                       ORDER BY ms ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM seq
        ), sess AS (
            SELECT key, sid,
                   MIN(ms) AS session_start_ms,
                   MAX(ms) AS session_end_ms,
                   COUNT(*) AS session_hits
            FROM grp GROUP BY key, sid
        )
        SELECT key, session_start_ms, session_end_ms, session_hits,
               'gap' AS closed_by
        FROM sess
        QUALIFY sid < MAX(sid) OVER (PARTITION BY key)
    """,
}

QUERIES = {
    "customer_balance_merge": customer_balance_merge,
    "stateful_sessions": stateful_sessions,
    "orders_snapshot_diff": orders_snapshot_diff,
}
