"""Bucketed table storage: pre-shuffled layouts for repeated joins.

A KG workload joins the same big tables on the same keys over and over
(edges⋈nodes on node ids, docs⋈scores on doc_id, signatures⋈signatures
on band keys). Hash-BUCKETING the tables on that key at write time moves
the shuffle from every query to the one write: Spark's bucketed-scan
rule matches the join distribution to the on-disk layout and elides the
Exchange on both sides (asserted in tests/test_plans.py).

Bucketed writes go through ``saveAsTable`` (the bucket metadata lives in
the catalog); ``path`` makes the table EXTERNAL so the parquet files
live where the caller says, surviving catalog resets — re-register with
:func:`register_bucketed` after a new session starts.

At 100-TB scale this is the difference between re-shuffling the edge
table for every analytics query and reading co-located buckets: choose
``n_buckets`` ≈ table size / target partition size (128-512 MB), and
keep the SAME n_buckets for tables that join together (mismatched
bucket counts fall back to a shuffle on one side).
"""
from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, path: str, keys,
                   n_buckets: int = 64, sort_keys=None,
                   mode: str = 'overwrite') -> None:
    """Write ``df`` as an external parquet table hash-bucketed on
    ``keys`` (and sorted within buckets by ``sort_keys``, defaulting to
    the bucket keys — sorted buckets additionally enable merge-join
    without a sort)."""
    if isinstance(keys, str):
        keys = [keys]
    sort_keys = sort_keys or keys
    if isinstance(sort_keys, str):
        sort_keys = [sort_keys]
    (df.write.mode(mode)
     .option('path', path)
     .bucketBy(n_buckets, keys[0], *keys[1:])
     .sortBy(sort_keys[0], *sort_keys[1:])
     .format('parquet')
     .saveAsTable(table))


def register_bucketed(spark, table: str, path: str) -> DataFrame:
    """Re-attach an existing bucketed table after a catalog reset: if the
    catalog already knows ``table`` return it, else the caller must
    rewrite (bucket metadata cannot be reconstructed from bare parquet —
    the reason production deployments keep a persistent metastore)."""
    if spark.catalog.tableExists(table):
        return spark.table(table)
    raise ValueError(
        'table {} not in the catalog; bucketed layouts need their catalog '
        'entry — rewrite with write_bucketed (path={})'.format(table, path))


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table (the catalog carries the bucket spec, so
    joins on the bucket keys skip their Exchange)."""
    return spark.table(table)
