"""Crawl-snapshot consolidation: re-crawled URL version handling.

A Common-Crawl-style corpus carries many snapshots of the same url across
crawls (the input table's (url, warc_ts) key). Before any downstream
curation the pipeline must consolidate: pick ONE canonical version per url
(the latest), and expose per-url re-crawl statistics (how often a page was
fetched, how often its content actually changed) — the freshness/stability
signals crawl scheduling feeds on.

Scale: both operators key every exchange by url — a high-cardinality,
near-uniform key (one group per page; a url's snapshot count is bounded by
the crawl count, so no group skew). The winner selection is a per-url
window, partitioned, never a global sort.
"""
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ['latest_snapshots', 'snapshot_stats']


def latest_snapshots(pages: DataFrame, url_col: str = 'url',
                     ts_col: str = 'warc_ts',
                     text_col: str = 'text') -> DataFrame:
    """One row per url: the snapshot with the greatest ``ts_col``.
    Exact-timestamp ties (two crawls in the same second) break
    deterministically on the content hash (descending), so reruns and the
    SQL mirror always pick the same winner."""
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), F.md5(F.col(text_col)).desc())
    return (
        pages.withColumn('_rn', F.row_number().over(w))
        .where(F.col('_rn') == 1)
        .drop('_rn')
    )


def snapshot_stats(pages: DataFrame, url_col: str = 'url',
                   ts_col: str = 'warc_ts',
                   text_col: str = 'text') -> DataFrame:
    """Per-url re-crawl statistics: (url, n_snapshots, n_versions,
    first_ts, last_ts, changed) where n_versions counts DISTINCT content
    (md5 of text) and ``changed`` flags urls whose content differed between
    any two crawls. One partially-aggregated exchange keyed by url."""
    return (
        pages.groupBy(F.col(url_col).alias('url'))
        .agg(
            F.count(F.lit(1)).alias('n_snapshots'),
            F.countDistinct(F.md5(F.col(text_col))).alias('n_versions'),
            F.min(ts_col).alias('first_ts'),
            F.max(ts_col).alias('last_ts'),
        )
        .withColumn('changed', F.col('n_versions') > 1)
    )
