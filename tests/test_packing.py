"""Sequence packing (textops/packing.py): distributed prefix sum
correctness, chunk-span invariants, greedy bin capacity."""
from pyspark.sql import Window, functions as F


def _counts(spark, rows):
    return spark.createDataFrame(rows, 'doc_id int, n_tokens int')


def test_token_offsets_match_global_cumsum(spark):
    """The two-phase shard cumsum must equal a single global window
    over the same (shard, doc_id) order."""
    from pybel_spark.textops import packing

    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    docs = _counts(spark, rows)
    offs = packing.token_offsets(docs, n_shards=7)
    w = Window.orderBy('shard', 'doc_id') \
        .rowsBetween(Window.unboundedPreceding, -1)
    naive = (docs.select(
        'doc_id', F.col('n_tokens').cast('long').alias('n'),
        packing.shard_of('doc_id', 7).alias('shard'))
        .withColumn('start_tok',
                    F.coalesce(F.sum('n').over(w), F.lit(0).cast('long'))))
    got = {r['doc_id']: r['start_tok'] for r in offs.collect()}
    want = {r['doc_id']: r['start_tok'] for r in naive.collect()}
    assert got == want


def test_concat_chunk_spans_invariants(spark):
    from pybel_spark.textops import packing

    rows = [(i, (i * 53) % 300 + 1) for i in range(100)] + [(100, 0)]
    docs = _counts(spark, rows)
    L = 128
    spans = packing.concat_chunk_spans(docs, seq_len=L, n_shards=5)
    spans.persist()
    data = [r.asDict() for r in spans.collect()]

    # empty doc emits nothing; every other doc's spans reconstruct it
    assert not any(d['doc_id'] == 100 for d in data)
    by_doc = {}
    for d in data:
        by_doc.setdefault(d['doc_id'], []).append(d)
    total = dict(rows)
    for doc_id, ds in by_doc.items():
        ds.sort(key=lambda d: d['seq_id'])
        assert sum(d['n_toks'] for d in ds) == total[doc_id]
        # doc offsets are contiguous from 0 and sequence ids consecutive
        off = 0
        for i, d in enumerate(ds):
            assert d['doc_off'] == off
            off += d['n_toks']
            if i:
                assert d['seq_id'] == ds[i - 1]['seq_id'] + 1
        # interior spans start at seq_off 0
        for d in ds[1:]:
            assert d['seq_off'] == 0

    # every sequence except the last is exactly full, with no overlap
    stats = {r['seq_id']: r['n_toks'] for r in packing.packing_stats(
        docs, seq_len=L, n_shards=5).collect()}
    last = max(stats)
    assert set(stats) == set(range(last + 1))  # no holes
    for sid, n in stats.items():
        assert n == L or sid == last
    assert sum(total.values()) == sum(stats.values())
    spans.unpersist()


def test_greedy_pack_capacity_and_no_split(spark):
    from pybel_spark.textops import packing

    rows = [(i, (i * 41) % 150 + 1) for i in range(120)] + \
        [(200, 999)]  # oversize doc → truncated to seq_len
    docs = _counts(spark, rows)
    L = 128
    packed = [r.asDict() for r in packing.greedy_pack(
        docs, seq_len=L, n_shards=4).collect()]
    assert len(packed) == len(rows)  # one row per doc — never split
    fills = {}
    for p in packed:
        fills.setdefault(p['bin_id'], []).append(p)
    for members in fills.values():
        members.sort(key=lambda p: p['bin_off'])
        off = 0
        for p in members:
            assert p['bin_off'] == off
            off += p['n_toks']
        assert off <= L
    big = next(p for p in packed if p['doc_id'] == 200)
    assert big['n_toks'] == L

    # determinism: same input → identical packing
    again = sorted((r['doc_id'], r['bin_id'], r['bin_off'])
                   for r in packing.greedy_pack(
                       docs, seq_len=L, n_shards=4).collect())
    assert again == sorted((p['doc_id'], p['bin_id'], p['bin_off'])
                           for p in packed)
