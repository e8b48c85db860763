"""Event-stream batch operators: gap-based sessionization.

The events table ((event_id, ts, user_id, event_type, value, props) —
crawl/user telemetry) sessionized the classic way: a new session starts
when the gap to the user's previous event exceeds a threshold. This is the
batch twin of the streaming session-window aggregation in streaming.py.

Scale: one window partitioned by user (never a global sort) + one
partially-aggregated groupBy on (user, session) — per-user data is bounded
by that user's event count, the standard sessionization shape. All time
arithmetic is integer microseconds (``unix_micros``), so the DuckDB
``epoch_us`` mirror is bit-exact.
"""
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ['sessionize', 'session_stats']


def sessionize(events: DataFrame, user_col: str = 'user_id',
               ts_col: str = 'ts', id_col: str = 'event_id',
               gap_minutes: int = 30) -> DataFrame:
    """Events + a ``session_idx`` column (0-based per user).

    Deterministic: the per-user order is (ts, event_id), so equal
    timestamps cannot flip session boundaries between runs or engines.
    """
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # parquet timestamps read as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP.
    # Only DIFFERENCES of the micros feed the outputs (gap compare,
    # duration), so the fixed session-tz offset introduced by the cast
    # cancels exactly.
    us = F.unix_micros(F.col(ts_col).cast('timestamp'))
    prev_us = F.lag(us).over(w)
    # two window steps (flag, then running sum) — Spark cannot nest the
    # lag inside the sum's frame; both share the same sort so the plan has
    # ONE exchange + one sort, two Window operators
    flagged = events.withColumn(
        '_new_flag',
        F.when(prev_us.isNull(), F.lit(0))
        .when(us - prev_us > gap_us, F.lit(1)).otherwise(F.lit(0)))
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        'session_idx', F.sum('_new_flag').over(run)).drop('_new_flag')


def session_stats(events: DataFrame, user_col: str = 'user_id',
                  ts_col: str = 'ts', id_col: str = 'event_id',
                  value_col: str = 'value',
                  gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, start/end,
    duration_us, value_sum_r). Duration is exact integer microseconds."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    # value_sum_r: a plain F.sum(double) is summed in partial-aggregation
    # arrival order, which varies run-to-run — near a 6th-decimal rounding
    # boundary the hash gate flips (CORRECTNESS_r06's one mismatch).
    # Summing the session's values by an explicit LEFT-TO-RIGHT fold in
    # (ts, event_id) order makes the float arithmetic deterministic (and
    # it is the same order the oracle's engine accumulates the windowed
    # subquery in). Sessions are per-user event runs, so the collected
    # array is bounded by a user's burst length — no skew hazard.
    vals = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col).alias('t'), F.col(id_col).alias('i'),
        F.col(value_col).alias('v'))))
    ordered_sum = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc + x['v'])
    return (
        s.groupBy(F.col(user_col).alias('user_id'), 'session_idx')
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            F.min(ts_col).alias('start_ts'),
            F.max(ts_col).alias('end_ts'),
            (F.unix_micros(F.max(ts_col).cast('timestamp'))
             - F.unix_micros(F.min(ts_col).cast('timestamp')))
            .alias('duration_us'),
            F.round(ordered_sum, 6).alias('value_sum_r'),
        )
    )
