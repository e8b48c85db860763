"""BM25 search (textops/search.py): scoring correctness, index round-trip,
partition-pruned serving."""
import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pybel_spark.textops import search


@pytest.fixture(scope='module')
def docs(spark):
    rows = [
        (0, 'spark join join shuffle'),
        (1, 'spark table'),
        (2, 'hash table scan scan scan'),
        (3, 'window agg'),
        (4, 'join'),
        (5, 'the quick brown fox'),
    ]
    return spark.createDataFrame(rows, 'doc_id bigint, text string')


@pytest.fixture(scope='module')
def queries(spark):
    return spark.createDataFrame(
        [('qa', 'spark join'), ('qb', 'scan')],
        'query_id string, query_text string')


def _py_bm25(corpus, qs, k1=1.2, b=0.75):
    """Independent pure-python reference."""
    toks = {d: t.split() for d, t in corpus}
    dls = {d: len(t) for d, t in toks.items()}
    n = len([d for d in toks if toks[d]])
    avgdl = sum(dls.values()) / n
    df = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in qs:
        scores = {}
        for t in set(qtext.split()):
            if t not in df:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for d, ts in toks.items():
                tf = ts.count(t)
                if not tf:
                    continue
                sat = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * sat
        out[qid] = {d: round(s, 6) for d, s in scores.items()}
    return out


def test_bm25_matches_pure_python(docs, queries):
    corpus = [(r['doc_id'], r['text']) for r in docs.collect()]
    qs = [(r['query_id'], r['query_text']) for r in queries.collect()]
    expected = _py_bm25(corpus, qs)
    got = search.bm25_topk(docs, queries, k=10).collect()
    for r in got:
        assert r['score_r'] == pytest.approx(
            expected[r['query_id']][r['doc_id']], abs=1e-6)
    # every matching doc is returned (k=10 > matches), ranked by score desc
    by_q = {}
    for r in got:
        by_q.setdefault(r['query_id'], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == len(expected[qid])
        ranked = sorted(rows, key=lambda r: r['rank'])
        scores = [r['score_r'] for r in ranked]
        assert scores == sorted(scores, reverse=True)


def test_bm25_repeated_query_terms_do_not_double_count(docs, spark):
    q1 = spark.createDataFrame([('q', 'join')],
                               'query_id string, query_text string')
    q2 = spark.createDataFrame([('q', 'join join join')],
                               'query_id string, query_text string')
    a = sorted(map(tuple, search.bm25_topk(docs, q1, k=10).collect()))
    b = sorted(map(tuple, search.bm25_topk(docs, q2, k=10).collect()))
    assert a == b


def test_index_serving_equals_direct(docs, queries, spark):
    base = tempfile.mkdtemp(prefix='pybel_spark_bm25_')
    try:
        search.bm25_index_write(docs, base, n_buckets=16)
        direct = sorted(map(tuple,
                            search.bm25_topk(docs, queries, k=10).collect()))
        served = sorted(map(tuple, search.bm25_index_topk(
            spark, base, queries, k=10, n_buckets=16).collect()))
        assert served == direct
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_index_serving_is_partition_pruned(docs, queries, spark):
    base = tempfile.mkdtemp(prefix='pybel_spark_bm25_')
    try:
        search.bm25_index_write(docs, base, n_buckets=16)
        out = search.bm25_index_topk(spark, base, queries, k=3, n_buckets=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert 'PartitionFilters' in plan
        # the pruning predicate actually references the bucket column
        import re
        assert re.search(r'PartitionFilters: \[[^\]]*bucket', plan), plan
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_topk_truncates_and_ranks_contiguously(docs, spark):
    q = spark.createDataFrame([('q', 'join table scan')],
                              'query_id string, query_text string')
    out = search.bm25_topk(docs, q, k=2).collect()
    assert [r['rank'] for r in sorted(out, key=lambda r: r['rank'])] == [1, 2]


def test_tfidf_keywords_hand_computed(spark):
    import math as _m
    rows = [
        (0, 'apple apple banana'),
        (1, 'banana cherry'),
        (2, 'cherry cherry cherry durian'),
    ]
    d = spark.createDataFrame(rows, 'doc_id bigint, text string')
    out = {(r['doc_id'], r['rank']): (r['term'], r['tfidf_r'])
           for r in search.tfidf_keywords(d, k=2).collect()}
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert out[(0, 1)][0] == 'apple'
    assert out[(0, 1)][1] == pytest.approx(round(2 * _m.log(3.0), 6))
    assert out[(0, 2)][0] == 'banana'
    # doc 2: cherry tf=3 df=2 -> 3*ln(1.5); durian tf=1 df=1 -> ln(3)
    assert out[(2, 1)][0] == 'cherry'
    assert out[(2, 2)][0] == 'durian'


def test_tfidf_rank_contiguous_and_capped(docs):
    out = search.tfidf_keywords(docs, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r['doc_id'], []).append(r['rank'])
    for doc, ranks in by_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_tfidf_cosine_pairs_hand_computed(spark):
    rows = [
        (0, 'apple banana cherry'),
        (1, 'apple banana cherry'),      # exact copy of 0 -> cosine 1
        (2, 'durian elderberry fig'),    # disjoint
        (3, 'apple banana grape'),       # partial overlap with 0/1
    ]
    d = spark.createDataFrame(rows, 'doc_id bigint, text string')
    out = {(r['doc_a'], r['doc_b']): r['cosine_r']
           for r in search.tfidf_cosine_pairs(
               d, threshold=0.0, max_df_frac=1.0).collect()}
    assert out[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) not in out and (1, 2) not in out  # no shared terms
    assert 0.0 < out[(0, 3)] < 1.0
    # high threshold keeps only the exact copy
    strict = {(r['doc_a'], r['doc_b'])
              for r in search.tfidf_cosine_pairs(
                  d, threshold=0.99, max_df_frac=1.0).collect()}
    assert strict == {(0, 1)}


def test_tfidf_cosine_hot_term_cap(spark):
    # 'the' appears in every doc (df 4 > 0.5*4); with max_df_frac=0.5 it
    # is dropped so docs sharing ONLY 'the' produce no pair, while
    # 'apple' (df 2 <= 2) survives the cap
    rows = [(0, 'the apple'), (1, 'the banana'),
            (2, 'the apple orchard'), (3, 'the kiwi')]
    d = spark.createDataFrame(rows, 'doc_id bigint, text string')
    pairs = {(r['doc_a'], r['doc_b'])
             for r in search.tfidf_cosine_pairs(
                 d, threshold=0.01, max_df_frac=0.5).collect()}
    assert (0, 1) not in pairs
    assert (0, 2) in pairs  # still share 'apple'


def test_index_append_equals_rebuild(docs, queries, spark):
    """Folding a second batch into the index serves identically to a
    full rebuild over the union."""
    batch1 = docs.where(F.col('doc_id') < 3)
    batch2 = docs.where(F.col('doc_id') >= 3)
    base_a = tempfile.mkdtemp(prefix='pybel_spark_bm25a_')
    base_b = tempfile.mkdtemp(prefix='pybel_spark_bm25b_')
    try:
        search.bm25_index_write(docs, base_a, n_buckets=16)
        search.bm25_index_write(batch1, base_b, n_buckets=16)
        search.bm25_index_append(batch2, base_b, n_buckets=16)
        full = sorted(map(tuple, search.bm25_index_topk(
            spark, base_a, queries, k=10, n_buckets=16).collect()))
        inc = sorted(map(tuple, search.bm25_index_topk(
            spark, base_b, queries, k=10, n_buckets=16).collect()))
        assert inc == full
        # combined marker stats equal the full-rebuild stats
        sa = search._stats_from_markers(spark, base_a).collect()[0]
        sb = search._stats_from_markers(spark, base_b).collect()[0]
        assert sb['n_docs'] == sa['n_docs']
        assert sb['avgdl'] == pytest.approx(sa['avgdl'], abs=1e-12)
    finally:
        shutil.rmtree(base_a, ignore_errors=True)
        shutil.rmtree(base_b, ignore_errors=True)


def test_index_append_replay_is_idempotent(docs, queries, spark):
    """Re-appending the same batch (uncoordinated retry) is a marker
    no-op: serving results are unchanged and stats are not double-counted."""
    batch1 = docs.where(F.col('doc_id') < 3)
    batch2 = docs.where(F.col('doc_id') >= 3)
    base = tempfile.mkdtemp(prefix='pybel_spark_bm25r_')
    try:
        search.bm25_index_write(batch1, base, n_buckets=16)
        assert search.bm25_index_append(batch2, base, n_buckets=16) is True
        before = sorted(map(tuple, search.bm25_index_topk(
            spark, base, queries, k=10, n_buckets=16).collect()))
        # replay: derived batch_id matches, marker short-circuits
        assert search.bm25_index_append(batch2, base, n_buckets=16) is False
        after = sorted(map(tuple, search.bm25_index_topk(
            spark, base, queries, k=10, n_buckets=16).collect()))
        assert after == before
        stats = search._stats_from_markers(spark, base).collect()[0]
        assert stats['n_docs'] == docs.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_index_append_crash_retry_collapses(docs, queries, spark):
    """Crash between postings-append and marker: orphan posting rows exist
    but the batch is invisible to stats; the retry re-appends and commits
    the marker once — serving dedupes (term, doc) so scores match a clean
    build exactly."""
    import os
    batch1 = docs.where(F.col('doc_id') < 3)
    batch2 = docs.where(F.col('doc_id') >= 3)
    base = tempfile.mkdtemp(prefix='pybel_spark_bm25c_')
    clean = tempfile.mkdtemp(prefix='pybel_spark_bm25d_')
    try:
        search.bm25_index_write(batch1, base, n_buckets=16)
        # first attempt "crashes" after the postings append: simulate by
        # applying then deleting the marker (postings rows remain)
        bid = search._derive_batch_id(batch2, 'doc_id')
        assert search.bm25_index_append(
            batch2, base, n_buckets=16, batch_id=bid) is True
        os.remove(os.path.join(base, 'applied', bid + '.json'))
        # stats see only batch1 — never half-applied
        mid = search._stats_from_markers(spark, base).collect()[0]
        assert mid['n_docs'] == batch1.count()
        # retry re-appends (duplicate posting rows) + commits the marker
        assert search.bm25_index_append(
            batch2, base, n_buckets=16, batch_id=bid) is True
        search.bm25_index_write(docs, clean, n_buckets=16)
        got = sorted(map(tuple, search.bm25_index_topk(
            spark, base, queries, k=10, n_buckets=16).collect()))
        want = sorted(map(tuple, search.bm25_index_topk(
            spark, clean, queries, k=10, n_buckets=16).collect()))
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(clean, ignore_errors=True)
