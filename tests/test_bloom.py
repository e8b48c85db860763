"""Bloom-filter crawl seen-set (textops/bloom.py).

Ground truth is a pure-Python mirror of the documented md5-position
contract — the same logic the DuckDB oracle for web_url_seen_bloom
unrolls in SQL.
"""
import hashlib

import pytest
from pyspark.sql import functions as F

from pybel_spark.textops import bloom


def _py_positions(value, m_bits, k, seed=0):
    return {int(hashlib.md5('{}:{}:{}'.format(seed, i, value)
                            .encode()).hexdigest()[:8], 16) % m_bits
            for i in range(k)}


@pytest.fixture(scope='module')
def urls(spark):
    return spark.createDataFrame(
        [('https://site{}.example.com/p/{}'.format(i % 50, i),)
         for i in range(400)], 'url string').persist()


def test_bits_match_python_mirror(spark, urls):
    got = {r['pos'] for r in bloom.bloom_bits(
        urls, m_bits=4096, k=3).collect()}
    want = set()
    for r in urls.collect():
        want |= _py_positions(r['url'], 4096, 3)
    assert got == want


def test_pack_round_trips_bits(spark, urls):
    bits = bloom.bloom_bits(urls, m_bits=4096, k=3)
    words = bloom.bloom_pack(bits, m_bits=4096).collect()
    unpacked = set()
    for r in words:
        assert r['word'] > 0  # sign bit never used
        for b in range(bloom.WORD_BITS):
            if r['word'] & (1 << b):
                unpacked.add(r['word_idx'] * bloom.WORD_BITS + b)
    assert unpacked == {r['pos'] for r in bits.collect()}


def test_no_false_negatives_and_deterministic_fps(spark, urls):
    # tiny filter (m=512 for 200 seen urls) to force false positives;
    # seen urls must ALL flag, and the FP set must be exactly the
    # python-mirror prediction — the filter is deterministic end to end
    seen = urls.where(F.substring('url', -1, 1).isin('0', '2', '4',
                                                     '6', '8'))
    rep = bloom.seen_filter_report(seen, urls, m_bits=512, k=3)
    rows = {r['url']: (r['maybe_seen'], r['seen_truth'])
            for r in rep.collect()}
    seen_set = {r['url'] for r in seen.collect()}
    bits = set()
    for u in seen_set:
        bits |= _py_positions(u, 512, 3)
    n_fp = 0
    for r in urls.collect():
        u = r['url']
        maybe, truth = rows[u]
        assert truth == (u in seen_set)
        if truth:
            assert maybe  # zero false negatives, structurally
        else:
            expect = _py_positions(u, 512, 3) <= bits
            assert maybe == expect
            n_fp += expect
    assert n_fp > 0  # the tiny sizing really does exhibit FPs


def test_probe_misses_unset_words(spark):
    # a candidate whose words are absent from the packed table entirely
    # (left-join null path) must come back maybe_seen=False
    seen = spark.createDataFrame([('a',)], 'url string')
    cand = spark.createDataFrame([('zzzz-never-seen',)], 'url string')
    words = bloom.bloom_pack(bloom.bloom_bits(seen, m_bits=1 << 20, k=3))
    got = bloom.bloom_probe(words, cand, m_bits=1 << 20, k=3).collect()
    assert [(r['url'], r['maybe_seen']) for r in got] == [
        ('zzzz-never-seen', False)]
