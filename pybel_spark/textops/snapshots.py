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


def paragraph_deltas(pages: DataFrame, url_col: str = 'url',
                     ts_col: str = 'warc_ts',
                     text_col: str = 'text') -> DataFrame:
    """Content deltas between consecutive crawls of each url:
    (url, version, n_added, n_removed, n_kept) where paragraphs (split on
    blank lines, trimmed, set semantics) are compared by hash against the
    previous version — the crawl-diff signal feeding change-rate models
    and incremental re-processing (only changed paragraphs re-enter the
    pipeline).

    Plan: one per-url window for version numbering (deterministic
    content-hash tie-break), one explode, then three partially-aggregated
    counts (current / previous / kept via an equi-join on
    (url, version, paragraph-hash)) — every exchange keyed by url or
    (url, version, hash), all near-uniform.
    """
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).asc(), F.md5(F.col(text_col)).asc())
    versioned = pages.select(
        F.col(url_col).alias('url'),
        (F.row_number().over(w) - 1).alias('v'),
        F.col(text_col).alias('text'))
    paras = (
        versioned
        .select('url', 'v',
                F.explode(F.split('text', r'\n\s*\n')).alias('p'))
        .select('url', 'v', F.trim('p').alias('p'))
        .where(F.col('p') != '')
        .select('url', 'v', F.md5('p').alias('ph'))
        .distinct()
    )
    versions = versioned.select('url', 'v').where(F.col('v') >= 1)
    cur = paras.where(F.col('v') >= 1)
    prev = (
        paras.select('url', (F.col('v') + 1).alias('v'), 'ph')
        .join(versions, on=['url', 'v'], how='leftsemi')
    )
    n_cur = cur.groupBy('url', 'v').agg(F.count(F.lit(1)).alias('n_cur'))
    n_prev = prev.groupBy('url', 'v').agg(F.count(F.lit(1)).alias('n_prev'))
    n_kept = (
        cur.join(prev, on=['url', 'v', 'ph'])
        .groupBy('url', 'v').agg(F.count(F.lit(1)).alias('n_kept'))
    )
    return (
        versions
        .join(n_cur, on=['url', 'v'], how='left')
        .join(n_prev, on=['url', 'v'], how='left')
        .join(n_kept, on=['url', 'v'], how='left')
        .select(
            'url', F.col('v').alias('version'),
            (F.coalesce('n_cur', F.lit(0))
             - F.coalesce('n_kept', F.lit(0))).alias('n_added'),
            (F.coalesce('n_prev', F.lit(0))
             - F.coalesce('n_kept', F.lit(0))).alias('n_removed'),
            F.coalesce('n_kept', F.lit(0)).alias('n_kept'))
    )
