"""Crawl-snapshot consolidation (textops/snapshots.py)."""
from datetime import datetime

from pyspark.sql import functions as F

from pybel_spark.textops import snapshots


def _pages(spark):
    rows = [
        # u1: 3 crawls, content changed on the 2nd, reverted on the 3rd
        ('u1', datetime(2024, 1, 1), 'alpha'),
        ('u1', datetime(2024, 1, 2), 'alpha CHANGED'),
        ('u1', datetime(2024, 1, 3), 'alpha'),
        # u2: single crawl
        ('u2', datetime(2024, 1, 1), 'beta'),
        # u3: two crawls, identical content
        ('u3', datetime(2024, 1, 1), 'gamma'),
        ('u3', datetime(2024, 2, 1), 'gamma'),
    ]
    return spark.createDataFrame(
        rows, 'url string, warc_ts timestamp, text string')


def test_latest_snapshots_picks_max_ts(spark):
    out = {r['url']: (r['warc_ts'], r['text'])
           for r in snapshots.latest_snapshots(_pages(spark)).collect()}
    assert out['u1'] == (datetime(2024, 1, 3), 'alpha')
    assert out['u2'] == (datetime(2024, 1, 1), 'beta')
    assert out['u3'] == (datetime(2024, 2, 1), 'gamma')


def test_latest_snapshots_tie_breaks_on_content_hash(spark):
    # same timestamp twice: winner is deterministic (md5 desc)
    rows = [('u', datetime(2024, 1, 1), 'aaa'),
            ('u', datetime(2024, 1, 1), 'bbb')]
    pages = spark.createDataFrame(
        rows, 'url string, warc_ts timestamp, text string')
    a = snapshots.latest_snapshots(pages).collect()
    b = snapshots.latest_snapshots(pages).collect()
    assert len(a) == 1 and a == b


def test_snapshot_stats(spark):
    out = {r['url']: r for r in snapshots.snapshot_stats(
        _pages(spark)).collect()}
    u1 = out['u1']
    assert (u1['n_snapshots'], u1['n_versions'], u1['changed']) \
        == (3, 2, True)
    assert u1['first_ts'] == datetime(2024, 1, 1)
    assert u1['last_ts'] == datetime(2024, 1, 3)
    assert (out['u2']['n_snapshots'], out['u2']['changed']) == (1, False)
    assert (out['u3']['n_versions'], out['u3']['changed']) == (1, False)


def test_latest_consistent_with_stats(spark):
    pages = _pages(spark)
    latest = snapshots.latest_snapshots(pages)
    stats = snapshots.snapshot_stats(pages)
    j = latest.join(stats, on='url')
    assert j.where(F.col('warc_ts') != F.col('last_ts')).count() == 0


def test_paragraph_deltas(spark):
    from datetime import datetime
    rows = [
        ('u', datetime(2024, 1, 1), 'alpha\n\nbeta'),
        ('u', datetime(2024, 1, 2), 'alpha\n\ngamma\n\ndelta'),
        ('u', datetime(2024, 1, 3), 'alpha\n\ngamma\n\ndelta'),
        ('w', datetime(2024, 1, 1), 'only'),
    ]
    pages = spark.createDataFrame(
        rows, 'url string, warc_ts timestamp, text string')
    out = {(r['url'], r['version']): (r['n_added'], r['n_removed'],
                                      r['n_kept'])
           for r in snapshots.paragraph_deltas(pages).collect()}
    # v1: beta removed; gamma+delta added; alpha kept
    assert out[('u', 1)] == (2, 1, 1)
    # v2 identical to v1: all kept
    assert out[('u', 2)] == (0, 0, 3)
    # single-version url emits no delta rows
    assert ('w', 0) not in out and ('w', 1) not in out
    assert set(out) == {('u', 1), ('u', 2)}


def test_paragraph_deltas_set_semantics(spark):
    from datetime import datetime
    # duplicate paragraphs within one version count once (set diff)
    rows = [
        ('u', datetime(2024, 1, 1), 'x\n\nx\n\ny'),
        ('u', datetime(2024, 1, 2), 'x\n\nz'),
    ]
    pages = spark.createDataFrame(
        rows, 'url string, warc_ts timestamp, text string')
    out = {r['version']: (r['n_added'], r['n_removed'], r['n_kept'])
           for r in snapshots.paragraph_deltas(pages).collect()}
    assert out[1] == (1, 1, 1)
