"""Event-stream operators in batch form (SURVEY.md §2.F F7).

The streaming pipelines (prometheus_pulsar_remote_write_spark.streaming)
run these same shapes with watermarks; the batch forms here give the
driver an ANSI-SQL oracle for each. Window starts leave the queries as
epoch BIGINTs (engine-portable; Spark session TZ is pinned UTC).

Scale notes: all of these are single hash-aggregations or window
functions keyed by (bucket, event_type) or user_id -- one shuffle each,
partial aggregation map-side where applicable. Sessionization is the
lag+cumsum formulation (one shuffle on user_id, no state explosion).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup
from ..schema import load_tables


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, ["events"])["events"]


def events_tumbling_hourly(spark, sf_dir):
    ev = _events(spark, sf_dir)
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


TUMBLING_SQL = """
SELECT epoch_ms(date_trunc('hour', ts)) // 1000 AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def events_sliding_10m_5m(spark, sf_dir):
    ev = _events(spark, sf_dir)
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# window length / slide = 2, so each event falls in exactly the two
# 5-minute-aligned windows starting at trunc5(ts) and trunc5(ts)-300.
SLIDING_SQL = """
WITH buckets AS (
  SELECT (epoch_ms(ts) // 1000 // 300) * 300 - off.o AS window_start, event_type, value
  FROM events, (VALUES (0), (300)) AS off(o)
)
SELECT window_start, event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM buckets GROUP BY 1, 2
"""


def events_sessionization(spark, sf_dir, gap_s: int = 1800):
    """Session = maximal run of per-user events with < gap_s between them.

    lag + cumulative-sum-of-boundaries; the streaming twin uses
    session_window(ts, gap).
    """
    ev = _events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    new_session = F.when(
        (ep - F.lag(ep).over(by_user)) > gap_s, 1
    ).otherwise(0)
    with_session = ev.withColumn(
        "session_seq",
        F.sum(F.coalesce(new_session, F.lit(0))).over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_session.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("session_start"),
        F.max(F.unix_timestamp("ts")).alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_ms(ts) // 1000
                   - lag(epoch_ms(ts) // 1000) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(epoch_ms(ts) // 1000) AS session_start,
       max(epoch_ms(ts) // 1000) AS session_end,
       round(sum(value), 2) AS session_value
FROM numbered GROUP BY user_id, session_seq
"""


def events_dedup_per_minute(spark, sf_dir):
    """F1 exact dedup: first event per (user, type, minute), deterministic."""
    ev = _events(spark, sf_dir).withColumn(
        "minute_bucket", (F.unix_timestamp("ts") / 60).cast("bigint") * 60
    )
    return exact_dedup(
        ev, ["user_id", "event_type", "minute_bucket"], ["ts", "event_id"]
    ).select("user_id", "event_type", "minute_bucket", "event_id")


DEDUP_MINUTE_SQL = """
SELECT user_id, event_type, minute_bucket, event_id
FROM (
  SELECT user_id, event_type, (epoch_ms(ts) // 1000 // 60) * 60 AS minute_bucket,
         event_id,
         row_number() OVER (PARTITION BY user_id, event_type,
                                         (epoch_ms(ts) // 1000 // 60) * 60
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def events_type_value_buckets(spark, sf_dir):
    """Histogram-style bucketing (D3 duration-histogram analog):
    width_bucket of value into 10 buckets per event_type."""
    ev = _events(spark, sf_dir)
    bucket = F.least(F.floor(F.col("value") / 100.0).cast("int"), F.lit(9))
    return ev.groupBy("event_type", bucket.alias("value_bucket")).agg(
        F.count("*").alias("n")
    )


VALUE_BUCKETS_SQL = """
SELECT event_type, least(floor(value / 100.0)::INT, 9) AS value_bucket, count(*) AS n
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_10m_5m": events_sliding_10m_5m,
    "events_sessionization": events_sessionization,
    "events_dedup_per_minute": events_dedup_per_minute,
    "events_type_value_buckets": events_type_value_buckets,
}

ORACLES = {
    "events_tumbling_hourly": TUMBLING_SQL,
    "events_sliding_10m_5m": SLIDING_SQL,
    "events_sessionization": SESSION_SQL,
    "events_dedup_per_minute": DEDUP_MINUTE_SQL,
    "events_type_value_buckets": VALUE_BUCKETS_SQL,
}
