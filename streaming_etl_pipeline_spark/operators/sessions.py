"""Sessionization: gap-based session windows over an event stream.

The reference has no session concept (only tumbling windows, SURVEY.md
§2.9 — "no sliding or session windows"); a user-behavior pipeline needs
them. Two implementations:

- **batch** (:func:`sessionize` / :func:`session_stats`): the classic
  lag-gap-cumsum composition — a new session starts when the gap from
  the previous event of the same key exceeds ``gap_seconds``; the
  running sum of start-flags numbers the sessions. Exactly expressible
  in ANSI SQL (DuckDB oracle twin) and equivalent to Spark's built-in
  ``F.session_window`` aggregation for the same gap.
- **streaming**: use ``F.session_window(ts, gap)`` in a watermarked
  ``groupBy`` (see streaming/ingest.py tests) — Spark maintains the
  session state store; the batch shape here is the backfill/repair path
  of the same semantics (the reference's hybrid design, T7).

Scale: one shuffle on the session key; the two window functions (lag,
running sum) share the same partitioning+ordering, so Catalyst evaluates
them in a single Window stage. Skewed keys (one bot user with millions
of events) degrade the sort — salt the key by day first if a key can
exceed a partition's memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICROS = 1_000_000


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign ``session_id`` (1-based per key) to every event.

    ``tiebreak`` columns make the within-key ordering total when
    timestamps can tie — required for cross-engine determinism of the
    *row-level* output (the per-session aggregates are tie-stable
    regardless).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    # Cast defensively: unix_micros rejects TIMESTAMP_NTZ, and NTZ→LTZ
    # under the UTC session tz is an exact reinterpretation.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    gap_us = ts_us - prev_us
    new_session = (
        F.when(prev_us.isNull() | (gap_us > gap_seconds * MICROS), 1).otherwise(0)
    )
    session_id = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", session_id)


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per (key, session): start/end, event count, duration.

    ``session_end`` follows Spark's ``session_window`` convention:
    last event time + gap (the window stays open for the gap length).
    """
    s = sessionize(df, keys, ts_col, gap_seconds, tiebreak)
    # Same defensive NTZ→LTZ normalization as sessionize, applied before
    # the min/max so every downstream unix_micros sees TIMESTAMP.
    s = s.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(*keys, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("last_event_time"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "session_end",
            F.timestamp_micros(
                F.unix_micros(F.col("last_event_time")) + gap_seconds * MICROS
            ),
        )
        .withColumn(
            "duration_seconds",
            (
                (
                    F.unix_micros(F.col("last_event_time"))
                    - F.unix_micros(F.col("session_start"))
                )
                / MICROS
            ).cast("double"),
        )
    )


def session_stats_sql(
    table: str,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB oracle twin of :func:`session_stats`."""
    keys_sql = ", ".join(keys)
    order_sql = ", ".join([ts_col, *tiebreak])
    gap_us = gap_seconds * MICROS
    return f"""
    WITH flagged AS (
      SELECT *,
        CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
               OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w > {gap_us}
             THEN 1 ELSE 0 END AS new_session
      FROM {table}
      WINDOW w AS (PARTITION BY {keys_sql} ORDER BY {order_sql})
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY {keys_sql} ORDER BY {order_sql}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT {keys_sql}, session_id::BIGINT AS session_id,
           min({ts_col}) AS session_start,
           max({ts_col}) AS last_event_time,
           count(*) AS n_events,
           make_timestamp(max(epoch_us({ts_col})) + {gap_us}) AS session_end,
           ((max(epoch_us({ts_col})) - min(epoch_us({ts_col}))) / {MICROS}.0)::DOUBLE
             AS duration_seconds
    FROM numbered
    GROUP BY {keys_sql}, session_id
    """
