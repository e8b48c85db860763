"""Property-based tests (hypothesis): dedup operators vs driver-side
recomputation on randomized corpora. Few examples, each a real Spark run."""
import hashlib
from itertools import combinations

import pytest
from hypothesis import given, settings, strategies as st

from pybel_spark.textops import dedup

TOKENS = ['alpha', 'beta', 'gamma', 'delta', 'epsilon', 'zeta', 'the', 'of']

doc_strategy = st.lists(st.sampled_from(TOKENS), min_size=1, max_size=12) \
    .map(' '.join)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8)


def _shingles(text, n=3):
    toks = text.split()
    if len(toks) < n:
        return {' '.join(toks)}
    return {' '.join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def _simhash(text):
    weights = {}
    for tok in text.split():
        weights[tok] = weights.get(tok, 0) + 1
    sums = [0] * 64
    for tok, w in weights.items():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for j in range(64):
            nibble = (h >> (60 - 4 * (j // 4))) & 0xF
            bit = (nibble >> (j % 4)) & 1
            sums[j] += w * (2 * bit - 1)
    sig = 0
    for j in range(64):
        if sums[j] > 0:
            sig |= 1 << j
    return sig


@pytest.mark.parametrize('dummy', [0])
@settings(max_examples=6, deadline=None)
@given(texts=corpus_strategy)
def test_jaccard_pairs_match_recomputation(spark, dummy, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), ['doc_id', 'text'])
    got = {(r['doc_a'], r['doc_b']): r['jaccard']
           for r in dedup.ngram_jaccard_pairs(
               docs, threshold=0.2, max_shingle_df=None).collect()}
    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    expected = {
        (a, b): _jaccard(sets[a], sets[b])
        for a, b in combinations(range(len(texts)), 2)
        if sets[a] & sets[b] and _jaccard(sets[a], sets[b]) >= 0.2
    }
    assert set(got) == set(expected)
    for pair, value in expected.items():
        assert abs(got[pair] - value) < 1e-9


@pytest.mark.parametrize('dummy', [0])
@settings(max_examples=6, deadline=None)
@given(texts=corpus_strategy,
       h=st.integers(min_value=1, max_value=8))
def test_simhash_exactness_property(spark, dummy, texts, h):
    """For any corpus and max_hamming, banded output == all-pairs Hamming,
    and signatures match a driver-side recomputation bit for bit."""
    docs = spark.createDataFrame(list(enumerate(texts)), ['doc_id', 'text'])
    sigs = {r['doc_id']: r['simhash'] for r in dedup.simhash(docs).collect()}
    for i, t in enumerate(texts):
        # Spark signature is a signed 64-bit long
        expected = _simhash(t)
        if expected >= 1 << 63:
            expected -= 1 << 64
        assert sigs[i] == expected, t
    got = {(r['doc_a'], r['doc_b']): r['hamming']
           for r in dedup.simhash_near_duplicates(
               docs, max_hamming=h).collect()}
    truth = {
        (a, b): bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count('1')
        for a, b in combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count('1') <= h
    }
    assert got == truth


@pytest.mark.parametrize('dummy', [0])
@settings(max_examples=4, deadline=None)
@given(texts=corpus_strategy)
def test_minhash_verified_subset_of_truth(spark, dummy, texts):
    """Verified MinHash pairs are always a subset of the true-Jaccard pairs
    at the same threshold (banding can miss, never invent)."""
    docs = spark.createDataFrame(list(enumerate(texts)), ['doc_id', 'text'])
    verified = {(r['doc_a'], r['doc_b'])
                for r in dedup.minhash_dedup_pairs(
                    docs, threshold=0.4).collect()}
    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    truth = {(a, b) for a, b in combinations(range(len(texts)), 2)
             if _jaccard(sets[a], sets[b]) >= 0.4}
    assert verified <= truth


@given(st.lists(st.lists(st.text(min_size=1, max_size=8), max_size=30),
                max_size=8),
       st.integers(min_value=2, max_value=32))
@settings(max_examples=50, deadline=None)
def test_kmv_merge_order_independent(batches, k):
    """The KMV sketch union must be associative/order-independent: feeding
    the same values in any batch order yields the same kept hashes and the
    same estimate (what checkpoint restarts and micro-batch splits rely
    on)."""
    import hashlib

    from pybel_spark.streaming import kmv_merge

    def run(batch_seq):
        hashes, over, est = [], False, 0
        for batch in batch_seq:
            hs = {hashlib.md5(v.encode()).hexdigest() for v in batch}
            hashes, over, est = kmv_merge(hs, hashes, over, k)
        return hashes, over, est

    a = run(batches)
    b = run(list(reversed(batches)))
    # single merged batch
    merged = [{v for batch in batches for v in batch}]
    c = run(merged)
    distinct = len({v for batch in batches for v in batch})
    if distinct <= k:
        assert a == b == c
        assert a[2] == distinct and not a[1]
    else:
        # overflow flag and kept set converge regardless of order
        assert a[0] == b[0] == c[0]
        assert a[1] and b[1] and c[1]
        assert a[2] == b[2] == c[2]


class TestMixtureThresholds:
    """Pure-python properties of the md5-threshold sampling math
    (textops.mixture) — no Spark session needed."""

    def test_threshold_monotonic_and_bounded(self):
        from hypothesis import given, strategies as st

        from pybel_spark.textops.mixture import fraction_to_hex_threshold

        @given(st.floats(min_value=0.0, max_value=1.0),
               st.floats(min_value=0.0, max_value=1.0))
        def check(f1, f2):
            t1 = fraction_to_hex_threshold(f1)
            t2 = fraction_to_hex_threshold(f2)
            if f1 < f2:
                assert t1 <= t2  # string order == numeric order by design
            assert fraction_to_hex_threshold(0.0) <= t1 \
                <= fraction_to_hex_threshold(1.0)

        check()

    def test_rate_matches_python_recomputation(self):
        """The Spark-side keep decision is a plain string comparison any
        engine reproduces: recompute it in pure python and check the
        empirical rate lands in binomial bounds."""
        import hashlib

        from pybel_spark.textops.mixture import fraction_to_hex_threshold

        frac = 0.3
        thr = fraction_to_hex_threshold(frac)
        kept = sum(
            1 for i in range(20_000)
            if hashlib.md5('0:{}'.format(i).encode()).hexdigest()[:8] < thr)
        assert abs(kept / 20_000 - frac) < 0.02

    def test_edge_fractions(self):
        import hashlib

        from pybel_spark.textops.mixture import fraction_to_hex_threshold

        all_thr = fraction_to_hex_threshold(1.0)
        none_thr = fraction_to_hex_threshold(0.0)
        for i in range(100):
            h = hashlib.md5('0:{}'.format(i).encode()).hexdigest()[:8]
            assert h < all_thr       # 1.0 keeps everything
            assert not (h < none_thr)  # 0.0 keeps nothing
