"""Salted-aggregation correctness: identical results to the direct plan."""
import pytest
from pyspark.sql import functions as F

from pybel_spark.skew import salted_count, salted_degree


def test_salted_count_matches_direct(spark):
    # heavily skewed key distribution: 90% of rows share one key
    df = spark.range(0, 20000).select(
        F.when(F.col('id') % 10 < 9, F.lit('hot'))
        .otherwise(F.concat(F.lit('k'), (F.col('id') % 50).cast('string')))
        .alias('key'))
    direct = {r['key']: r['n'] for r in
              df.groupBy('key').agg(F.count(F.lit(1)).alias('n')).collect()}
    salted = {r['key']: r['n'] for r in salted_count(df, 'key').collect()}
    assert salted == direct
    assert direct['hot'] == 18000


def test_salted_degree_matches_node_degrees(spark):
    edges = spark.createDataFrame(
        [('a', 'b'), ('a', 'c'), ('a', 'd'), ('b', 'c'), ('d', 'a')],
        ['source_id', 'target_id'])
    got = {r['node_id']: r['degree'] for r in salted_degree(edges).collect()}
    assert got == {'a': 4, 'b': 2, 'c': 2, 'd': 2}
