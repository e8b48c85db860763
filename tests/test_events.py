"""Gap-based sessionization (pybel_spark/events.py)."""
from datetime import datetime, timedelta

from pybel_spark.events import session_stats, sessionize


def _ev(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions (40-min gap between event 2 and 3)
        (0, t0, 1, 1.0),
        (1, t0 + timedelta(minutes=10), 1, 2.0),
        (2, t0 + timedelta(minutes=50), 1, 4.0),
        (3, t0 + timedelta(minutes=55), 1, 8.0),
        # user 2: one session, exactly-30-min gap does NOT split
        (4, t0, 2, 1.5),
        (5, t0 + timedelta(minutes=30), 2, 2.5),
    ]
    return spark.createDataFrame(
        rows, 'event_id bigint, ts timestamp, user_id bigint, value double')


def test_sessionize_boundaries(spark):
    out = {r['event_id']: r['session_idx']
           for r in sessionize(_ev(spark), gap_minutes=30).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 0, 5: 0}


def test_session_stats(spark):
    out = {(r['user_id'], r['session_idx']): r
           for r in session_stats(_ev(spark), gap_minutes=30).collect()}
    s0 = out[(1, 0)]
    assert s0['n_events'] == 2 and s0['value_sum_r'] == 3.0
    assert s0['duration_us'] == 10 * 60 * 1_000_000
    s1 = out[(1, 1)]
    assert s1['n_events'] == 2 and s1['value_sum_r'] == 12.0
    assert out[(2, 0)]['n_events'] == 2
    assert out[(2, 0)]['duration_us'] == 30 * 60 * 1_000_000


def test_sessionize_single_exchange(spark):
    plan = sessionize(_ev(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    # both window steps share one hashpartitioning exchange on user_id
    assert plan.count('Exchange hashpartitioning') == 1


def test_session_stats_sum_deterministic_across_layouts(spark):
    """r7 determinism contract (CORRECTNESS_r06's one hash mismatch):
    value_sum_r is an explicit (ts, event_id)-ordered fold, so the
    rounded sum must be IDENTICAL whatever partitioning the input
    arrives with — a plain F.sum(double) summed in partial-agg arrival
    order and could flip the 6th decimal between runs."""
    ev = spark.read.parquet('/root/testdata/sf0.001/events.parquet')

    def sums(df, n_part):
        old = spark.conf.get('spark.sql.shuffle.partitions')
        spark.conf.set('spark.sql.shuffle.partitions', str(n_part))
        try:
            return {(r['user_id'], r['session_idx']): repr(r['value_sum_r'])
                    for r in session_stats(df, gap_minutes=30).collect()}
        finally:
            spark.conf.set('spark.sql.shuffle.partitions', old)

    a = sums(ev, 3)
    b = sums(ev.repartition(17), 64)
    c = sums(ev.coalesce(1), 8)
    assert a == b == c and len(a) > 0
