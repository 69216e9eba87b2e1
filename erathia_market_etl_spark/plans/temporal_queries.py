"""Temporal-join queries over events: as-of join (clicks -> latest
prior purchase per user) and bounded range self-join (error bursts).
The DuckDB oracles use the engine-native formulations (ASOF JOIN, plain
range theta-join) — maximally independent implementations of the same
semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, bounded_range_self_join
from ..sources.events import load_events
from .registry import query

# purchases deduped to one row per (user, ts) keeping max event_id —
# ASOF tie-breaking is otherwise unspecified in both engines
_PURCHASES_CTE = """
    purchases AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    )
"""


def _dedup_purchases(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        events.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )


@query(
    "asof_click_to_purchase",
    oracle=f"""
    WITH {_PURCHASES_CTE}
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS ts_matched,
           p.event_id AS event_id_matched,
           p.value AS value_matched
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
)
def asof_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click gets the user's most recent purchase at
    or before it (left outer). Spark side: tagged union + one sort-based
    window — one shuffle on user_id, no range probing. Oracle: DuckDB's
    native ASOF LEFT JOIN."""
    events = load_events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = _dedup_purchases(events)
    return asof_join(
        clicks, purchases, on="user_id", ts="ts", right_cols=["event_id", "value"]
    ).orderBy("event_id")


@query(
    "range_join_error_bursts",
    oracle="""
    WITH err AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT a.user_id,
           a.event_id AS a_event_id,
           b.event_id AS b_event_id,
           CAST(date_sub('second', a.ts, b.ts) AS BIGINT) AS gap_seconds
    FROM err a JOIN err b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    ORDER BY a.user_id, a_event_id, b_event_id
    """,
)
def range_join_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range self-join: pairs of error events from the same user
    within 10 minutes (burst detection). Spark side prunes via 10-minute
    time-bucket equi-join (each left row meets only its own and the next
    bucket); the oracle is DuckDB's range theta-join (IEJoin)."""
    events = load_events(spark, sf_dir)
    errs = events.filter(F.col("event_type") == "error")
    pairs = bounded_range_self_join(
        errs, key="user_id", ts="ts", max_gap_seconds=600, select_cols=["event_id"]
    )
    return pairs.select(
        "user_id",
        F.col("a_event_id"),
        F.col("b_event_id"),
        (F.col("b_ts").cast("timestamp").cast("double")
         - F.col("a_ts").cast("timestamp").cast("double"))
        .cast("bigint").alias("gap_seconds"),
    ).orderBy("user_id", "a_event_id", "b_event_id")
