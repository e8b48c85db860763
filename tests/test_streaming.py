"""Structured Streaming: incremental parse with exactly-once append sink."""
import os
import shutil
import tempfile

import pytest

from pybel_spark.corpus import CorpusSpec, generate_documents
from pybel_spark.streaming import read_stream_output, start_edge_stream


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix='pybel_spark_stream_')
    paths = {k: os.path.join(base, k) for k in ('input', 'out')}
    os.makedirs(paths['input'])
    yield paths
    shutil.rmtree(base, ignore_errors=True)


def expected_triples(n_docs):
    spec = CorpusSpec()
    out = set()
    for i in range(n_docs):
        for idx in spec.unit_indices(i):
            out.update(tuple(t) for t in spec.units[idx]['golden']['triples'])
    return out


def test_streaming_incremental_parse(spark, dirs):
    # batch 1: docs 0..59 land
    generate_documents(spark, 60, partitions=2) \
        .write.mode('append').parquet(dirs['input'])
    q = start_edge_stream(spark, dirs['input'], dirs['out'])
    q.awaitTermination(120)

    out = read_stream_output(spark, dirs['out'])
    got1 = {tuple(r) for r in out['triples'].collect()}
    assert got1 == expected_triples(60)

    # batch 2: more documents arrive; a new availableNow run picks up ONLY
    # the new files (checkpoint) and appends
    import pyspark.sql.functions as F
    docs2 = generate_documents(spark, 90, partitions=2) \
        .where(F.split(F.col('url'), '/').getItem(4).cast('int') >= 60)
    docs2.write.mode('append').parquet(dirs['input'])

    q2 = start_edge_stream(spark, dirs['input'], dirs['out'])
    q2.awaitTermination(120)

    out = read_stream_output(spark, dirs['out'])
    got2 = {tuple(r) for r in out['triples'].collect()}
    assert got2 == expected_triples(90)

    # re-running with no new input appends nothing (exactly-once)
    n_edges_before = spark.read.parquet(
        os.path.join(dirs['out'], 'edges_log')).count()
    q3 = start_edge_stream(spark, dirs['input'], dirs['out'])
    q3.awaitTermination(120)
    n_edges_after = spark.read.parquet(
        os.path.join(dirs['out'], 'edges_log')).count()
    assert n_edges_before == n_edges_after
