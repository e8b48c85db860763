"""Benchmark decontamination (textops/decontaminate.py)."""
from pyspark.sql import functions as F

from pybel_spark.textops.decontaminate import (
    benchmark_contamination, decontaminate,
)

WORDS = ['alpha', 'beta', 'gamma', 'delta', 'epsilon', 'zeta', 'eta',
         'theta', 'iota', 'kappa']


def _text(idx_seq):
    return ' '.join(WORDS[i % len(WORDS)] for i in idx_seq)


def _corpus(spark):
    bench_text = _text(range(0, 12))          # 12 tokens
    leaked = 'x y z ' + _text(range(0, 9)) + ' q r'   # copies an 8+gram run
    clean = _text(range(5, 25, 2)) + ' ' + _text(range(1, 20, 3))
    short = 'alpha beta'                       # < n tokens
    docs = spark.createDataFrame(
        [(1, leaked), (2, clean), (3, short)], ['doc_id', 'text'])
    bench = spark.createDataFrame(
        [(100, bench_text)], ['bench_id', 'text'])
    return docs, bench


def test_planted_contamination_detected(spark):
    docs, bench = _corpus(spark)
    hits = benchmark_contamination(docs, bench, n=8).collect()
    assert {(r['doc_id'], r['bench_id']) for r in hits} == {(1, 100)}
    # leaked doc shares exactly the 8-grams inside the copied 9-token run:
    # positions 0..1 of a 9-token window -> 2 distinct 8-grams
    assert hits[0]['n_shared_ngrams'] == 2


def test_decontaminate_removes_only_hits(spark):
    docs, bench = _corpus(spark)
    kept = sorted(r['doc_id']
                  for r in decontaminate(docs, bench, n=8).collect())
    assert kept == [2, 3]


def test_short_doc_whole_text_shingle(spark):
    # a benchmark doc shorter than n collapses to a whole-text shingle;
    # an identical short corpus doc must still be caught
    docs = spark.createDataFrame(
        [(1, 'alpha beta'), (2, 'alpha gamma')], ['doc_id', 'text'])
    bench = spark.createDataFrame([(7, 'alpha beta')], ['bench_id', 'text'])
    hits = benchmark_contamination(docs, bench, n=8).collect()
    assert [(r['doc_id'], r['bench_id'], r['n_shared_ngrams'])
            for r in hits] == [(1, 7, 1)]


def test_bench_index_is_broadcast(spark):
    docs, bench = _corpus(spark)
    plan = benchmark_contamination(docs, bench, n=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert 'BroadcastHashJoin' in plan, plan
