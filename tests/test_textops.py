"""Training-data ops tests: dedup, similarity, quality, multimodal plumbing."""
import math

import pytest
from pyspark.sql import functions as F

from pybel_spark.textops import dedup, multimodal, quality, similarity, tokenize

SF_DIR = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def docs(spark):
    """Small corpus with exact and near duplicates built in."""
    base = [
        (0, 'the quick brown fox jumps over the lazy dog near the river bank'),
        (1, 'the quick brown fox jumps over the lazy dog near the river bank'),  # exact dup of 0
        (2, 'the quick brown fox jumps over the lazy dog near the river'),       # near dup of 0
        (3, 'a completely different document about spark and distributed data'),
        (4, 'der schnelle braune fuchs springt über den faulen hund im wald und ist weg'),
        (5, 'le renard brun rapide saute par dessus le chien paresseux dans la forêt'),
        (6, 'the quick brown fox jumps over the lazy dog near the river bend'),  # near dup of 0/2
        (7, 'zzz qqq xxx 12345 !!!! ???? @@@@ #### $$$$ %%%% ^^^^ &&&&'),
    ]
    df = spark.createDataFrame(base, ['doc_id', 'text']).persist()
    df.count()
    yield df
    df.unpersist()


def test_exact_duplicates(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]['n_docs'] == 2
    assert groups[0]['keep_doc_id'] == 0

    members = dedup.exact_duplicate_members(docs).orderBy('doc_id').collect()
    assert [(r['doc_id'], r['member_rank'], r['is_keep']) for r in members] \
        == [(0, 1, True), (1, 2, False)]


def test_exact_duplicates_mega_group_bounded(spark):
    """A pathological group (one page duplicated 50k times) must flow
    through as ONE constant-size row — the old collect_list(doc_ids)
    formulation built a 50k-element array in a single aggregation buffer."""
    from pyspark.sql import functions as F

    docs = (
        spark.range(50_000)
        .select(F.col('id').alias('doc_id'),
                F.lit('the same boilerplate page every time').alias('text'))
    )
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]['n_docs'] == 50_000
    assert groups[0]['keep_doc_id'] == 0
    assert 'doc_ids' not in groups[0].asDict()

    capped = dedup.exact_duplicate_members(docs, max_members=5).collect()
    assert len(capped) == 5
    assert {r['doc_id'] for r in capped} == {0, 1, 2, 3, 4}


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r['doc_a'], r['doc_b']): r['jaccard']
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0            # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7
    assert (0, 6) in pairs
    assert all(a < b for a, b in pairs)


def test_minhash_candidates_cover_near_dups(spark, docs):
    verified = {(r['doc_a'], r['doc_b'])
                for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in verified
    assert (0, 2) in verified
    # verified pairs are a subset of true-jaccard pairs
    truth = {(r['doc_a'], r['doc_b'])
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert verified <= truth


def test_ngram_jaccard_hot_shingle_cap(spark):
    """Skewed corpus: one boilerplate shingle in 50% of docs. The df cap
    drops it before the self-join, bounding candidates; true near-dup pairs
    survive because they share informative (rare) shingles too."""
    boiler = 'all rights reserved contact us'
    rows = []
    for i in range(100):
        body = 'unique document {} with words alpha{} beta{} gamma{}'.format(
            i, i, i, i)
        text = body + (' ' + boiler if i % 2 == 0 else '')
        rows.append((i, text))
    # one true near-dup pair that also carries the boilerplate
    rows.append((100, 'shared payload sentence tokens here ' + boiler))
    rows.append((101, 'shared payload sentence tokens here also ' + boiler))
    docs = spark.createDataFrame(rows, ['doc_id', 'text'])

    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_df=10)
    pairs = {(r['doc_a'], r['doc_b']) for r in capped.collect()}
    assert (100, 101) in pairs
    # the 50 boilerplate-only docs share nothing informative → no pair among
    # doc_ids 0..99 (the hot shingles were dropped pre-join)
    assert not any(a < 100 and b < 100 for a, b in pairs)

    # candidate volume is bounded: the uncapped join would compare all
    # C(51,2)=1275 boilerplate carriers; capped intersection counts only
    # pairs sharing a rare shingle
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.0,
                                         max_shingle_df=None).count()
    capped_all = dedup.ngram_jaccard_pairs(docs, threshold=0.0,
                                           max_shingle_df=10).count()
    assert capped_all < uncapped


def test_simhash_banding_is_exact(spark, docs):
    """Block-combination banding finds EXACTLY the all-pairs Hamming ≤ h
    set, for any n_blocks > h."""
    sigs = {r['doc_id']: r['simhash'] for r in dedup.simhash(docs).collect()}
    ids = sorted(sigs)
    # n_blocks choices keep C(n_blocks, h) key combos small: 4, 56, 9, 45
    for h, blocks in ((3, None), (3, 8), (8, None), (8, 10)):
        truth = {
            (a, b): bin(sigs[a] ^ sigs[b]).count('1')
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(sigs[a] ^ sigs[b]).count('1') <= h
        }
        got = {(r['doc_a'], r['doc_b']): r['hamming']
               for r in dedup.simhash_near_duplicates(
                   docs, max_hamming=h, n_blocks=blocks).collect()}
        assert got == truth, (h, blocks)


def test_simhash_banding_rejects_too_few_blocks(spark, docs):
    with pytest.raises(ValueError):
        dedup.simhash_near_duplicates(docs, max_hamming=4, n_blocks=4).count()


def test_simhash_near_duplicates(spark, docs):
    sigs = {r['doc_id']: r['simhash'] for r in dedup.simhash(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    pairs = {(r['doc_a'], r['doc_b']): r['hamming']
             for r in dedup.simhash_near_duplicates(docs, max_hamming=8).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs


def test_detect_language(spark, docs):
    langs = {r['doc_id']: r['detected_lang']
             for r in quality.detect_language(docs).collect()}
    assert langs[0] == 'en'
    assert langs[4] == 'de'
    assert langs[5] == 'fr'
    assert langs[7] == 'unknown'


def test_quality_features_and_score(spark, docs):
    feats = {r['doc_id']: r for r in quality.quality_features(docs).collect()}
    row = feats[0]
    text = docs.where('doc_id = 0').collect()[0]['text']
    tokens = text.split()
    assert row['n_tokens'] == len(tokens)
    assert row['n_chars_computed'] == len(text)
    assert abs(row['mean_token_len']
               - sum(len(t) for t in tokens) / len(tokens)) < 1e-12
    scores = {r['doc_id']: r['quality_score']
              for r in quality.quality_score(docs).collect()}
    assert scores[0] == 1.0
    assert scores[7] < 0.75  # junk doc penalized


def test_repetition_features(spark):
    df = spark.createDataFrame([
        (0, 'spam spam spam spam spam spam'),
        (1, 'every word here is fully distinct today'),
        (2, 'buy now buy now buy now buy now'),
    ], ['doc_id', 'text'])
    feats = {r['doc_id']: r for r in
             quality.repetition_features(df).collect()}
    assert feats[0]['dup_token_ratio'] > 0.8
    assert feats[1]['dup_token_ratio'] == 0.0
    assert feats[2]['top_bigram_ratio'] > 0.4
    assert feats[1]['top_bigram_ratio'] < 0.3


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, 'Hello  World'), (1, 'hello world'), (2, ' HELLO\tWORLD ')],
        ['doc_id', 'text'])
    fps = [r['fingerprint'] for r in quality.fingerprint(df).collect()]
    assert len(set(fps)) == 1


def test_tokenize_shingles(spark):
    df = spark.createDataFrame([(0, 'a b c d')], ['doc_id', 'text'])
    rows = df.select(tokenize.shingles('text', 3).alias('s')).collect()
    assert rows[0]['s'] == ['a b c', 'b c d']
    short = spark.createDataFrame([(0, 'a b')], ['doc_id', 'text'])
    rows = short.select(tokenize.shingles('text', 3).alias('s')).collect()
    assert rows[0]['s'] == ['a b']


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    vectors = spark.read.parquet(f'{SF_DIR}/embeddings.parquet').limit(80).persist()
    rows = vectors.collect()
    mats = {r['vec_id']: np.array(r['embedding'], dtype='float64') for r in rows}

    got = similarity.cosine_topk(vectors, k=3, query_ids=[0, 1, 2]).collect()
    got_sets = {}
    for r in got:
        got_sets.setdefault(r['vec_id'], set()).add(r['neighbor_id'])

    for q in (0, 1, 2):
        qv = mats[q]
        sims = sorted(
            ((np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)), nid)
             for nid, v in mats.items() if nid != q),
            key=lambda t: (-t[0], t[1]))
        expected = {nid for _, nid in sims[:3]}
        assert got_sets[q] == expected

    vectors.unpersist()


def test_lsh_topk_recall(spark):
    vectors = spark.read.parquet(f'{SF_DIR}/embeddings.parquet').persist()
    queries = list(range(20))
    exact = similarity.cosine_topk(vectors, k=5, query_ids=queries)
    approx = similarity.lsh_topk(vectors, k=5, n_planes=4, query_ids=queries)
    recall = similarity.knn_recall(exact, approx)
    assert recall >= 0.5  # 4 planes = 16 buckets over 500 vecs
    vectors.unpersist()


def test_multimodal_feature_plumbing(spark):
    media = multimodal.synthetic_media(spark, n_rows=30, decodable=False)
    feats = multimodal.extract_features(media, use_fake_decoder=True).collect()
    assert len(feats) == 30
    by_id = {r['media_id']: r for r in feats}
    assert all(len(r['feature']) == 8 for r in feats)
    # deterministic: recompute one feature on the driver
    import hashlib
    payload = hashlib.sha256(b'3').digest() * (1 + 3 % 5)
    expected = multimodal.deterministic_fake_feature(payload, 8)
    got = by_id['media-3']['feature']
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, expected))


def test_ppm_codec_roundtrip():
    pixels = [(x % 256, (x * 7) % 256, (x * 13) % 256) for x in range(12 * 5)]
    payload = multimodal.encode_ppm(12, 5, pixels)
    w, h, decoded = multimodal.decode_ppm(payload)
    assert (w, h) == (12, 5)
    assert decoded == pixels
    small = multimodal.resize_image_block_mean(w, h, decoded, out_w=4, out_h=2)
    assert len(small) == 8


def test_wav_codec_roundtrip():
    samples = [int(10000 * (k % 17 / 17.0 - 0.5)) for k in range(400)]
    payload = multimodal.encode_wav(samples, sample_rate=8000)
    rate, decoded = multimodal.decode_wav(payload)
    assert rate == 8000
    assert decoded == samples


def test_real_decode_through_arrow_stage(spark):
    """PPM + WAV + Y4M payloads all decode to REAL features through
    mapInPandas — the non-fake path end-to-end for every modality."""
    media = multimodal.synthetic_media(spark, n_rows=30)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r['media_id']: r for r in feats}
    # recompute one image feature on the driver from the same payload
    row = media.where(F.col('media_id') == 'media-0').first()
    expected = multimodal.DECODERS['image'](bytes(row['payload']))
    got = by_id['media-0']['feature']
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, expected))
    # audio features are physically plausible: duration > 0, rms <= peak <= 1
    audio = [r for r in feats if r['modality'] == 'audio']
    assert audio
    for r in audio:
        duration, rms, peak, zcr = r['feature'][:4]
        assert duration > 0 and 0 <= rms <= peak <= 1 and 0 <= zcr <= 1
    # video features: n_frames >= 2, duration > 0, luma means in [0, 1]
    video = [r for r in feats if r['modality'] == 'video']
    assert video
    for r in video:
        n_frames, duration, motion = r['feature'][:3]
        assert n_frames >= 2 and duration > 0 and 0 <= motion <= 1
        assert all(0 <= m <= 1 for m in r['feature'][3:7])


def test_y4m_codec_roundtrip():
    frames = []
    for f in range(3):
        y = bytes((x * 7 + f) % 256 for x in range(6 * 4))
        u = v = bytes(6 * 4)
        frames.append((y, u, v))
    payload = multimodal.encode_y4m(6, 4, frames, fps=10)
    w, h, fps, lumas = multimodal.decode_y4m(payload)
    assert (w, h, fps) == (6, 4, 10)
    assert lumas == [f[0] for f in frames]
    assert multimodal.sample_frames(lumas, 2) == [lumas[0], lumas[1]]
    with pytest.raises(ValueError):
        multimodal.decode_y4m(payload[:20])  # truncated frame


def test_embedding_near_duplicates(spark):
    """LSH path finds exact-duplicate vectors with recall 1 (identical
    vectors share every bucket); exact path agrees; sub-threshold pairs
    excluded."""
    import math
    rows = []
    for i in range(40):
        base = [math.sin(i * 17.0 + d) for d in range(16)]
        rows.append((i, base))
        if i % 4 == 0:
            rows.append((100 + i, list(base)))  # exact duplicate
    vectors = spark.createDataFrame(rows, 'vec_id long, embedding array<float>')

    approx = {(r['vec_a'], r['vec_b'])
              for r in similarity.embedding_near_duplicates(
                  vectors, threshold=0.99).collect()}
    exact = {(r['vec_a'], r['vec_b'])
             for r in similarity.embedding_near_duplicates(
                 vectors, threshold=0.99, exact=True).collect()}
    expected = {(i, 100 + i) for i in range(0, 40, 4)}
    assert expected <= approx
    assert approx <= exact
    assert expected <= exact


def test_ivf_topk_recall_and_probe_scaling(spark):
    """IVF probes the nearest inverted lists: recall grows with n_probe
    and reaches 1.0 at n_probe == n_lists (brute force)."""
    vectors = spark.read.parquet(f'{SF_DIR}/embeddings.parquet').persist()
    qids = list(range(10))
    exact = similarity.cosine_topk(vectors, k=5, query_ids=qids)

    full = similarity.ivf_topk(vectors, k=5, n_lists=8, n_probe=8,
                               query_ids=qids)
    assert similarity.knn_recall(exact, full) == 1.0

    lo = similarity.knn_recall(
        exact, similarity.ivf_topk(vectors, k=5, n_lists=8, n_probe=1,
                                   query_ids=qids))
    hi = similarity.knn_recall(
        exact, similarity.ivf_topk(vectors, k=5, n_lists=8, n_probe=4,
                                   query_ids=qids))
    assert lo <= hi <= 1.0
    assert hi > 0.5
    vectors.unpersist()


def test_ivf_assignments_partition_everything(spark):
    vectors = spark.read.parquet(f'{SF_DIR}/embeddings.parquet')
    assignments, centroids = similarity.ivf_assignments(vectors, n_lists=8)
    rows = assignments.collect()
    assert len(rows) == vectors.count()
    assert {r['list_id'] for r in rows} <= set(range(8))
    assert centroids.shape[0] == 8


def test_ivf_skewed_assignment_no_megabuffer(spark):
    """VERDICT r2: a pathologically skewed corpus (90% of vectors identical
    → one giant inverted list) must refine and search without materializing
    an inverted list in a single aggregation buffer, and ``query_ids=None``
    must run fully distributed (no driver collect of vectors)."""
    import numpy as np

    rng_dim = 16
    rows = []
    hot = [1.0] * rng_dim
    for i in range(2000):
        if i % 10:
            rows.append((i, hot))  # 90% on one point → one hot list
        else:
            v = [float(((i * 31 + d * 7) % 13) - 6) for d in range(rng_dim)]
            rows.append((i, v))
    vectors = spark.createDataFrame(
        rows, 'vec_id long, embedding array<float>')
    out = similarity.ivf_topk(vectors, k=3, n_lists=4, n_probe=2,
                              query_ids=None, refine_iterations=2)
    got = out.groupBy('vec_id').count().collect()
    assert len(got) == 2000
    assert all(r['count'] <= 3 for r in got)


def test_cosine_pairs_null_and_ragged_rows_dont_kill_the_task(spark):
    """r5 review: the vectorized scoring stage must map NULL / ragged /
    non-finite embeddings to similarity 0.0 (the Column-based cosine()'s
    zero-vector behavior) instead of raising inside mapInPandas."""
    rows = [(0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),
            (2, None),               # failed embedding
            (3, [1.0, 0.0]),         # ragged width
            (4, [float('nan')] * 3)]  # non-finite
    vecs = spark.createDataFrame(rows, 'vec_id long, embedding array<double>')
    out = {(r['vec_id'], r['neighbor_id']): r['similarity']
           for r in similarity.cosine_topk(vecs, k=4,
                                           query_ids=[0]).collect()}
    assert out[(0, 1)] == __import__('pytest').approx(1.0)
    assert out[(0, 2)] == 0.0
    assert out[(0, 3)] == 0.0
    assert out[(0, 4)] == 0.0


def test_ivf_index_duplicate_external_queries(spark, tmp_path):
    """r5 review: a duplicated q_id in an external serving batch must
    not multiply candidate rows past the dedup (k distinct neighbors,
    no repeats)."""
    vecs = spark.read.parquet('/root/testdata/sf0.001/embeddings.parquet')
    path = str(tmp_path / 'ivf_dupq')
    similarity.ivf_index_write(vecs, path, n_lists=4)
    one = vecs.limit(1).select(F.col('vec_id').alias('q_id'),
                               F.col('embedding').alias('q_vec'))
    dup_queries = one.unionByName(one).unionByName(one)
    out = similarity.ivf_index_topk(spark, path, k=3,
                                    queries=dup_queries).collect()
    assert len(out) == 3
    assert len({r['neighbor_id'] for r in out}) == 3


def test_format_sniffing_magic_bytes():
    """Dispatch comes from payload magic bytes, never the mime column —
    incl. the vendored hand-built baseline JPEG fixture."""
    import os

    jpg = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'fixtures', 'tiny.jpg'), 'rb').read()
    assert multimodal.sniff_format(jpg) == 'jpeg'
    assert jpg.endswith(b'\xff\xd9')  # well-formed: SOI..EOI
    assert multimodal.sniff_format(
        multimodal.encode_ppm(1, 1, [(1, 2, 3)])) == 'ppm'
    assert multimodal.sniff_format(multimodal.encode_wav([0, 1])) == 'wav'
    assert multimodal.sniff_format(
        multimodal.encode_y4m(
            2, 2, [(b'\x00' * 4, b'\x00' * 4, b'\x00' * 4)])) == 'y4m'
    assert multimodal.sniff_format(
        b'\x89PNG\r\n\x1a\n' + b'x' * 8) == 'png'
    assert multimodal.sniff_format(b'ID3\x04aaaa') == 'mp3'
    assert multimodal.sniff_format(b'\x00\x00\x00\x18ftypisom') == 'mp4'
    assert multimodal.sniff_format(b'garbage') == 'unknown'


def test_injected_jpeg_decoder_routes_through_arrow_stage(spark):
    """The injectable-compressed-codec path (r4 verdict task #8): with
    NO jpeg decoder registered the vendored JPEG yields feature NULL
    (plumbing intact, no task failure); with an injected decoder the
    SAME Spark stage produces its features — the registry snapshot
    travels to executors via the closure."""
    import os

    jpg = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'fixtures', 'tiny.jpg'), 'rb').read()
    ppm = multimodal.encode_ppm(2, 2, [(10, 20, 30)] * 4)
    rows = [('a-jpg', 'image', 'image/jpeg', jpg, None, None, None),
            ('b-ppm', 'image', 'image/x-portable-pixmap', ppm,
             2, 2, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    # default registry: jpeg sniffed but unregistered -> NULL, ppm real
    feats = {r['media_id']: r['feature']
             for r in multimodal.extract_features(media).collect()}
    assert feats['a-jpg'] is None
    assert feats['b-ppm'] is not None

    # injected stub decoder (stands in for Pillow, absent here)
    decoders = dict(multimodal.FORMAT_DECODERS)
    decoders['jpeg'] = multimodal.deterministic_fake_feature
    feats2 = {r['media_id']: r['feature']
              for r in multimodal.extract_features(
                  media, format_decoders=decoders).collect()}
    assert feats2['a-jpg'] == [
        __import__('pytest').approx(v)
        for v in multimodal.deterministic_fake_feature(jpg)]
    assert feats2['b-ppm'] == feats['b-ppm']

    # Pillow registration is a clean no-op in this container
    assert multimodal.try_register_pillow_decoders() is False


class TestProductQuantization:
    """IVF-PQ building blocks: per-subspace codebooks, byte codes, ADC
    ranking — the memory-bounded serving path (m bytes/vector instead of
    dim×8)."""

    def _vectors(self, spark, n=400, dim=32):
        rows = []
        for i in range(n):
            # two well-separated clusters + deterministic jitter
            base = 10.0 if i % 2 == 0 else -10.0
            v = [base + ((i * 13 + d * 7) % 11) / 11.0
                 for d in range(dim)]
            rows.append((i, v))
        return spark.createDataFrame(rows, 'vec_id long, embedding array<double>')

    def test_encode_deterministic_and_compact(self, spark):
        from pybel_spark.textops import similarity

        vecs = self._vectors(spark)
        cb = similarity.pq_train(vecs, m=8, k=16, refine_iterations=1)
        assert cb.shape == (8, 16, 4)
        a = {r['vec_id']: list(r['pq_codes'])
             for r in similarity.pq_encode(vecs, cb).collect()}
        b = {r['vec_id']: list(r['pq_codes'])
             for r in similarity.pq_encode(vecs, cb).collect()}
        assert a == b and len(a) == 400
        assert all(len(c) == 8 and all(0 <= x < 16 for x in c)
                   for c in a.values())

    def test_adc_topk_recall_floor(self, spark):
        """ADC top-k against the compressed codes must substantially
        agree with the exact cosine top-k (these clusters are far apart,
        so a correct PQ easily clears 0.6 mean recall at m=8, k=16)."""
        from pybel_spark.textops import similarity

        vecs = self._vectors(spark).persist()
        try:
            cb = similarity.pq_train(vecs, m=8, k=16, refine_iterations=2)
            codes = similarity.pq_encode(vecs, cb)
            queries = [(r['vec_id'], r['embedding'])
                       for r in vecs.where('vec_id < 10').collect()]
            approx = similarity.pq_topk(codes, cb, queries, k=5)
            exact = similarity.cosine_topk(vecs, k=5,
                                           query_ids=list(range(10)))
            a = {(r['vec_id'], r['neighbor_id']) for r in approx.collect()}
            e = {(r['vec_id'], r['neighbor_id']) for r in exact.collect()}
            assert len(a) == 50  # 10 queries × k
            recall = len(a & e) / len(e)
            assert recall >= 0.6, recall
            # ADC distances are ascending per query
            rows = approx.orderBy('vec_id', 'rank').collect()
            by_q = {}
            for r in rows:
                by_q.setdefault(r['vec_id'], []).append(r['adc_distance'])
            for dists in by_q.values():
                assert dists == sorted(dists)
        finally:
            vecs.unpersist()

    def test_rerank_recovers_exact_topk(self, spark):
        """Two-stage retrieval: ADC shortlist (k×factor) + exact-cosine
        re-rank must recover (nearly) the exact top-k even where raw ADC
        alone is lossy — on these separable clusters it is exact."""
        from pybel_spark.textops import similarity

        vecs = self._vectors(spark).persist()
        try:
            cb = similarity.pq_train(vecs, m=8, k=16, refine_iterations=2)
            codes = similarity.pq_encode(vecs, cb)
            queries = [(r['vec_id'], r['embedding'])
                       for r in vecs.where('vec_id < 10').collect()]
            rer = similarity.pq_topk(codes, cb, queries, k=5,
                                     rerank_vectors=vecs, rerank_factor=8)
            exact = similarity.cosine_topk(vecs, k=5,
                                           query_ids=list(range(10)))
            a = {(r['vec_id'], r['neighbor_id']) for r in rer.collect()}
            e = {(r['vec_id'], r['neighbor_id']) for r in exact.collect()}
            assert len(a & e) / len(e) >= 0.9, len(a & e) / len(e)
        finally:
            vecs.unpersist()

    def test_ivf_pq_index_pruned_serving(self, spark, tmp_path):
        """IVF×PQ composition: the ADC scan reads only the probed
        list_id partitions AND only the code columns (no vector column
        below the scoring stage); full-probe serving matches plain
        pq_topk+rerank recall."""
        import re

        from pybel_spark.textops import similarity

        vecs = self._vectors(spark).persist()
        try:
            path = str(tmp_path / 'pq_index')
            similarity.pq_index_write(vecs, path, n_lists=4, m=8, k=16)
            queries = [(r['vec_id'], r['embedding'])
                       for r in vecs.where('vec_id < 10').collect()]
            out = similarity.pq_index_topk(spark, path, queries, k=5,
                                           n_probe=4, rerank_factor=8)
            exact = similarity.cosine_topk(vecs, k=5,
                                           query_ids=list(range(10)))
            a = {(r['vec_id'], r['neighbor_id']) for r in out.collect()}
            e = {(r['vec_id'], r['neighbor_id']) for r in exact.collect()}
            assert len(a & e) / len(e) >= 0.9, len(a & e) / len(e)

            # selective probing prunes partitions in the scan
            sel = similarity.pq_index_topk(spark, path, queries[:2], k=3,
                                           n_probe=1)
            plan = sel._jdf.queryExecution().executedPlan().toString()
            assert re.search(r'PartitionFilters: \[[^\]]*list_id', plan), \
                plan
            assert sel.count() == 6
        finally:
            vecs.unpersist()

    def test_empty_and_degenerate_inputs(self, spark):
        from pybel_spark.textops import similarity

        vecs = self._vectors(spark, n=20)
        cb = similarity.pq_train(vecs, m=4, k=8, refine_iterations=0)
        empty = vecs.where('vec_id < 0')
        assert similarity.pq_encode(empty, cb).count() == 0
        queries = [(0, [0.0] * 32)]  # zero query: valid LUT, no NaN
        out = similarity.pq_topk(similarity.pq_encode(vecs, cb), cb,
                                 queries, k=3).collect()
        assert len(out) == 3
        assert all(r['adc_distance'] == r['adc_distance'] for r in out)
        # empty queries: empty result, not a numpy AxisError (r5 review)
        assert similarity.pq_topk(similarity.pq_encode(vecs, cb), cb,
                                  [], k=3).count() == 0

    def test_single_batch_corpus_still_returns_k(self, spark):
        """r5 review: the query's own row must be excluded BEFORE the
        per-batch shortlist cut — a single-partition corpus otherwise
        returns k-1 neighbors for in-corpus queries."""
        from pybel_spark.textops import similarity

        vecs = self._vectors(spark, n=50).coalesce(1)
        cb = similarity.pq_train(vecs, m=4, k=8, refine_iterations=1)
        codes = similarity.pq_encode(vecs, cb).coalesce(1)
        queries = [(r['vec_id'], r['embedding'])
                   for r in vecs.where('vec_id < 3').collect()]
        out = similarity.pq_topk(codes, cb, queries, k=5)
        counts = {r['vec_id']: r['cnt'] for r in
                  out.groupBy('vec_id').agg(
                      F.count('*').alias('cnt')).collect()}
        assert counts == {0: 5, 1: 5, 2: 5}, counts


def test_corrupt_media_yields_null_feature_not_task_failure(spark):
    """ADVICE r2: a truncated/hostile payload must not kill the Spark task —
    the row comes back with feature NULL while healthy rows decode."""
    import pandas as pd

    good = multimodal.encode_wav([0, 100, -100, 200] * 50)
    rows = [
        ('ok-wav', 'audio', 'audio/wav', good, None, None, 100),
        ('bad-truncated', 'audio', 'audio/wav', good[:30], None, None, None),
        ('bad-junk', 'image', None, b'\x00\x01\x02garbage', None, None, None),
        ('bad-empty', 'video', None, b'', None, None, None),
        ('bad-fmt', 'audio', 'audio/wav',
         b'RIFF\x10\x00\x00\x00WAVEfmt \x02\x00\x00\x00\x01\x00', None,
         None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r['media_id']: r for r in
             multimodal.extract_features(media).collect()}
    assert len(feats) == 5
    assert feats['ok-wav']['feature'] is not None
    for bad in ('bad-truncated', 'bad-junk', 'bad-empty', 'bad-fmt'):
        assert feats[bad]['feature'] is None, bad


def test_ivf_index_write_and_serve(spark, tmp_path):
    """Materialized IVF index: build once (assignments partitioned by
    list_id + centroid sidecar), then serve queries with results identical
    to the in-memory ivf_topk, and with the scan pruned to probed lists."""
    vectors = spark.read.parquet(f'{SF_DIR}/embeddings.parquet').persist()
    path = str(tmp_path / 'ivf_index')
    similarity.ivf_index_write(vectors, path, n_lists=8)

    import os
    parts = [d for d in os.listdir(path + '/assignments')
             if d.startswith('list_id=')]
    assert len(parts) <= 8 and parts

    qids = list(range(10))
    served = {(r['vec_id'], r['neighbor_id']) for r in
              similarity.ivf_index_topk(spark, path, k=5, n_probe=4,
                                        query_ids=qids).collect()}
    direct = {(r['vec_id'], r['neighbor_id']) for r in
              similarity.ivf_topk(vectors, k=5, n_lists=8, n_probe=4,
                                  query_ids=qids).collect()}
    assert served == direct

    # external query DataFrame path
    q = vectors.where(F.col('vec_id') < 3).select(
        F.col('vec_id').alias('q_id'), F.col('embedding').alias('q_vec'))
    ext = similarity.ivf_index_topk(spark, path, k=3, queries=q)
    assert ext.groupBy('vec_id').count().count() == 3
    vectors.unpersist()


def test_near_duplicate_clusters_and_filter(spark):
    """Transitive near-dup clustering + representative filter: a chain
    a~b, b~c clusters {a,b,c} even though a,c were never paired; keep =
    cluster min + all unpaired docs."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], 'doc_a long, doc_b long')
    clusters = {(r['doc_id'], r['cluster_id']) for r in
                dedup.near_duplicate_clusters(pairs).collect()}
    assert clusters == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
                        (20, 20), (21, 20)}

    docs = spark.createDataFrame(
        [(i, 'text %d' % i) for i in (1, 2, 3, 5, 10, 11, 20, 21, 99)],
        'doc_id long, text string')
    kept = {r['doc_id'] for r in dedup.drop_near_duplicates(
        docs, dedup.near_duplicate_clusters(pairs)).collect()}
    assert kept == {1, 5, 10, 20, 99}


def test_bpe_train_apply_roundtrip():
    """Real BPE semantics on a toy corpus: training learns the frequent
    pairs in order; application replays them lowest-rank-first."""
    from pybel_spark.textops.bpe import bpe_apply, train_bpe

    merges = train_bpe({'low': 5, 'lower': 2, 'newest': 6, 'widest': 3}, 10)
    ranks = {m: i for i, m in enumerate(merges)}
    # 'est' appears in newest+widest (9 occurrences of (e,s) then (es,t))
    assert merges[0] == ('e', 's')
    assert merges[1] == ('es', 't')
    # with the full table the training word collapses entirely; with only
    # the first two merges it stops at the learned 'est' suffix
    assert bpe_apply('newest', ranks) == ['newest']
    assert bpe_apply('newest', {('e', 's'): 0, ('es', 't'): 1}) \
        == ['n', 'e', 'w', 'est']
    # unseen word falls back toward characters
    assert len(bpe_apply('zzz', ranks)) == 3
    # deterministic: same input, same merges
    assert train_bpe({'low': 5, 'lower': 2, 'newest': 6, 'widest': 3},
                     10) == merges


def test_bpe_fast_trainer_matches_reference():
    """train_bpe_fast (indexed, what trains the 32k fixture) must emit
    the EXACT merge sequence of the O(merges×vocab) reference trainer —
    same greedy counts, same lexicographic tie-break, same <2 stop."""
    from pybel_spark.textops.bpe import (
        synthetic_word_counts, train_bpe, train_bpe_fast,
    )

    wc = {'low': 5, 'lower': 2, 'newest': 6, 'widest': 3, 'aaa': 4}
    assert train_bpe_fast(wc, 50) == train_bpe(wc, 50)
    big = synthetic_word_counts(n_stems=80, n_suffixes=5)
    assert train_bpe_fast(big, 300) == train_bpe(big, 300)


def test_bpe_32k_fixture_loads_and_applies():
    """The vendored realistic-scale table: 32768 merges, reproducible
    header, and bpe_apply compresses vocabulary words with it."""
    from pybel_spark.textops.bpe import (
        MERGES_32K_PATH, bpe_apply, load_merges, synthetic_word_counts,
    )

    ranks = load_merges(MERGES_32K_PATH)
    assert len(ranks) == 32768
    # a high-frequency vocabulary word must compress far below chars
    word = sorted(synthetic_word_counts(n_stems=10, n_suffixes=2))[0]
    assert len(bpe_apply(word, ranks)) < len(word)


def test_bpe_token_counts_spark_matches_python(spark):
    """The distributed distinct-word pipeline must equal driver-side
    bpe_apply word by word, including zero-token docs."""
    import re

    from pybel_spark.textops.bpe import (bpe_apply, bpe_token_counts,
                                         load_merges)
    from pybel_spark.textops.tokenize import BPE_ISH_PATTERN

    ranks = load_merges()
    rows = [(0, 'SET Citation increases the abundance of things'),
            (1, ''), (2, '   '), (3, 'p(HGNC:AKT1) increases p(HGNC:EGFR)')]
    docs = spark.createDataFrame(rows, ['doc_id', 'text'])
    got = {r['doc_id']: r['n_bpe_real_tokens']
           for r in bpe_token_counts(docs, ranks).collect()}
    for doc_id, text in rows:
        expected = sum(len(bpe_apply(w, ranks))
                       for w in re.findall(BPE_ISH_PATTERN, text))
        assert got[doc_id] == expected, (doc_id, got[doc_id], expected)


MULTILINGUAL = [
    (0, 'the cat is on the mat and it is happy'),
    (1, 'el gato es un animal y no es para la casa'),
    (2, 'o gato um animal e para com os uns'),
    (3, 'il gatto un animale e non per il divano'),
    (4, 'de kat is een dier en het is niet voor de deur'),
    (5, '猫は動物です それは家のためではありません'),
    (6, '猫是动物它不是为了家'),
    (7, '고양이는 동물입니다 집을 위한 것이 아닙니다'),
    (8, 'кошка это животное а не для дома'),
    (9, 'القطة حيوان وليست للمنزل'),
    (10, 'बिल्ली एक जानवर है और घर के लिए नहीं'),
    (11, 'η γάτα είναι ζώο και όχι για το σπίτι'),
    (12, 'zzz qqq xxx 12345'),
]
MULTILINGUAL_EXPECT = ['en', 'es', 'pt', 'it', 'nl', 'ja', 'zh', 'ko',
                       'ru', 'ar', 'hi', 'el', 'unknown']


def test_detect_language_multilingual(spark):
    """Script-range detection (ja/zh/ko/ru/ar/hi/el) + the widened Latin
    stopword lists (es/pt/it/nl)."""
    df = spark.createDataFrame(MULTILINGUAL, ['doc_id', 'text'])
    got = [r['detected_lang']
           for r in quality.detect_language(df).orderBy('doc_id').collect()]
    assert got == MULTILINGUAL_EXPECT


def test_detect_language_sql_parity_multilingual(spark):
    """The DuckDB oracle CTE must agree with the Spark column expression
    on every script family, not just the sf corpus (which is Latin-only)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    df = spark.createDataFrame(MULTILINGUAL, ['doc_id', 'text'])
    spark_rows = [(r['doc_id'], r['detected_lang'])
                  for r in quality.detect_language(df).orderBy('doc_id').collect()]

    con = duckdb.connect()
    con.register('documents',
                 pd.DataFrame(MULTILINGUAL, columns=['doc_id', 'text']))
    sql_rows = con.execute(entry._language_detect_sql()).fetchall()
    assert spark_rows == [(int(a), b) for a, b in sql_rows]


def test_detect_language_eval_corpus_accuracy(spark):
    """ACCURACY floor on the vendored multilingual eval corpus
    (fixtures/langid_eval.tsv — 4 natural sentences per language, 14
    languages): the earlier tests pin SQL parity, this one pins that
    the detector is actually RIGHT (r4 verdict task #10). Current
    measured accuracy is 56/56; floors leave headroom for heuristic
    evolution without letting a regression through."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'fixtures', 'langid_eval.tsv')
    rows = []
    with open(path, encoding='utf8') as fh:
        for i, line in enumerate(fh):
            lang, text = line.rstrip('\n').split('\t')
            rows.append((i, lang, text))
    df = spark.createDataFrame(rows, 'doc_id long, lang string, text string')
    got = {r['doc_id']: r['detected_lang']
           for r in quality.detect_language(df).collect()}
    per = {}
    for i, lang, _text in rows:
        ok, n = per.get(lang, (0, 0))
        per[lang] = (ok + (got[i] == lang), n + 1)
    langs = sorted(per)
    assert len(langs) == 14
    for lang in langs:
        ok, n = per[lang]
        assert ok >= 3, (lang, per[lang])  # per-language floor 3/4
    total_ok = sum(ok for ok, _ in per.values())
    total = sum(n for _, n in per.values())
    assert total_ok / total >= 0.9, (total_ok, total)


class TestMixture:
    """Training-mixture ops: deterministic stratified sampling and
    per-source token budgeting (exact window + scale-path histogram)."""

    def _docs(self, spark):
        from pybel_spark.textops import mixture  # noqa: F401 (import check)

        rows = []
        for i in range(400):
            source = 'src{}'.format(i % 4)
            words = ['the', 'data', 'engine', 'word{}'.format(i % 7)] \
                * (3 + i % 5)
            rows.append((i, source, ' '.join(words)))
        return spark.createDataFrame(rows, 'doc_id long, source string, text string')

    def test_stratified_sample_rates_and_determinism(self, spark):
        from pybel_spark.textops import mixture

        docs = self._docs(spark).persist()
        try:
            fractions = {'src0': 1.0, 'src1': 0.5, 'src2': 0.0}
            kept = mixture.stratified_sample(docs, fractions,
                                             default_fraction=0.2)
            rows = kept.groupBy('source').count().collect()
            by_source = {r['source']: r['count'] for r in rows}
            assert by_source.get('src0') == 100          # fraction 1.0: all
            assert 'src2' not in by_source               # fraction 0.0: none
            assert 20 <= by_source.get('src1', 0) <= 80  # ~50 of 100
            assert 5 <= by_source.get('src3', 0) <= 45   # default 0.2: ~20
            # rerun → bit-identical decisions
            again = {r['doc_id'] for r in mixture.stratified_sample(
                docs, fractions, default_fraction=0.2).collect()}
            assert again == {r['doc_id'] for r in kept.collect()}
            # different seed → different (but still valid) subsample
            other = {r['doc_id'] for r in mixture.stratified_sample(
                docs, fractions, default_fraction=0.2, seed=1).collect()}
            assert other != again
        finally:
            docs.unpersist()

    def test_stratified_sample_no_shuffle_plan(self, spark):
        from pybel_spark.textops import mixture

        docs = self._docs(spark)
        plan = mixture.stratified_sample(docs, {'src0': 0.5}) \
            ._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan  # pure map-side filter

    def test_token_budget_exact_matches_python(self, spark):
        from pybel_spark.textops import mixture
        from pybel_spark.textops.quality import quality_score

        docs = self._docs(spark).persist()
        try:
            budget = 150
            got = mixture.token_budget_select(docs, budget).collect()
            scores = {r['doc_id']: r['quality_score']
                      for r in quality_score(docs).collect()}
            texts = {r['doc_id']: r for r in docs.collect()}
            for source in ('src0', 'src1', 'src2', 'src3'):
                members = sorted(
                    (d for d in texts.values() if d['source'] == source),
                    key=lambda d: (-scores[d['doc_id']], d['doc_id']))
                cum, expect = 0, []
                for d in members:
                    n = len(d['text'].split())
                    cum += n
                    if cum > budget:
                        break
                    expect.append(d['doc_id'])
                assert sorted(r['doc_id'] for r in got
                              if r['source'] == source) == sorted(expect), source
            for r in got:
                assert r['cum_tokens'] <= budget
        finally:
            docs.unpersist()

    def test_token_budget_approx_respects_budget(self, spark):
        from pybel_spark.textops import mixture

        docs = self._docs(spark).persist()
        try:
            budget = 150
            got = mixture.token_budget_select_approx(docs, budget)
            per_source = got.groupBy('source').agg(
                F.sum('n_tokens').alias('tok')).collect()
            # fully-kept bins stay within budget; the boundary bin is
            # hash-sampled at the leftover fraction, so the total tracks
            # the budget in expectation (binomial noise)
            for r in per_source:
                assert 0 < r['tok'] <= 2 * budget, r
            # a budget that fits everything keeps everything
            all_rows = mixture.token_budget_select_approx(docs, 10 ** 9)
            assert all_rows.count() == docs.count()
        finally:
            docs.unpersist()

    def test_boundary_take_independent_of_upstream_sample(self, spark):
        """Composed pipeline (stratified_sample → approx budget): the
        boundary-bin hash must be salted DISTINCTLY from the seed-0
        sampling hash, else every sample survivor also passes the
        boundary threshold and the kept mass overshoots the budget by
        the whole boundary bin (code-review r5)."""
        from pybel_spark.textops import mixture

        # one source, uniform quality → everything lands in one bin, so
        # the budget is met ONLY by the boundary-bin partial take
        docs = spark.createDataFrame(
            [(i, 'src', 'tok ' * 10) for i in range(2000)],
            'doc_id long, source string, text string')
        sampled = mixture.stratified_sample(
            docs, {'src': 0.3}, id_col='doc_id', seed=0).persist()
        try:
            n_sampled = sampled.count()
            sampled_tokens = n_sampled * 10
            budget = sampled_tokens // 2
            kept = mixture.token_budget_select_approx(sampled, budget)
            kept_tokens = kept.agg(F.sum('n_tokens')).first()[0]
            # correlated hashes keep ~100% of survivors (~2x budget);
            # independent hashes keep ~budget ± binomial noise
            assert kept_tokens < 1.3 * budget, (kept_tokens, budget)
            assert kept_tokens > 0.7 * budget, (kept_tokens, budget)
        finally:
            sampled.unpersist()


class TestUrls:
    """URL canonicalization / domain ops (textops.urls)."""

    CASES = [
        (0, 'https://WWW.Example.COM:443/a/b/?utm_source=x&q=1&fbclid=z#top'),
        (1, 'http://news.site.co.uk/article/42?ref=home'),
        (2, 'https://example.com'),
        (3, 'https://mirror.example.com/a/b?q=1'),
        (4, 'https://www.example.com/a/b/?utm_campaign=y&q=1'),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, u, 'some text here') for i, u in self.CASES],
            'doc_id long, url string, text string')

    def test_parse_and_canonicalize(self, spark):
        from pybel_spark.textops import urls

        rows = {r['doc_id']: r
                for r in urls.parse_urls(self._df(spark)).collect()}
        r0 = rows[0]
        assert r0['scheme'] == 'https'
        assert r0['host'] == 'www.example.com'      # lowercased, port gone
        assert r0['domain'] == 'example.com'
        assert r0['clean_query'] == 'q=1'           # tracking params out
        assert r0['canonical_url'] == 'https://www.example.com/a/b?q=1'
        assert rows[1]['domain'] == 'site.co.uk'    # two-level suffix
        assert rows[1]['clean_query'] == ''         # ref= stripped
        assert rows[2]['canonical_url'] == 'https://example.com/'
        # 0 and 4 collapse to the same canonical url; 3 (different host)
        # does not
        assert rows[4]['canonical_url'] == r0['canonical_url']
        assert rows[3]['canonical_url'] != r0['canonical_url']

    def test_url_duplicates_and_blocklist(self, spark):
        from pybel_spark.textops import urls

        df = self._df(spark)
        dups = urls.url_duplicates(df).collect()
        assert len(dups) == 1
        assert dups[0]['n_docs'] == 2 and dups[0]['keep_doc_id'] == 0

        kept = urls.filter_blocked_domains(df, {'example.com'})
        assert {r['doc_id'] for r in kept.collect()} == {1}
        blocked_df = spark.createDataFrame([('example.com',)], 'domain string')
        kept2 = urls.filter_blocked_domains(df, blocked_df)
        assert {r['doc_id'] for r in kept2.collect()} == {1}

    def test_domain_stats(self, spark):
        from pybel_spark.textops import urls

        stats = {r['domain']: r
                 for r in urls.domain_stats(self._df(spark)).collect()}
        assert stats['example.com']['n_docs'] == 4
        assert stats['example.com']['n_hosts'] == 3  # www/bare/mirror
        assert stats['site.co.uk']['n_docs'] == 1


class TestParagraphDedup:
    """Paragraph-level (C4-style) dedup: repeated spans across docs."""

    def _df(self, spark):
        boiler = 'subscribe to the newsletter'
        rows = [
            (0, 'unique alpha text\n\n' + boiler + '\n\nmore alpha words'),
            (1, 'unique beta text\n\n' + boiler),
            (2, boiler + '\n\n' + boiler + '\n\nunique gamma text'),
            (3, '   \n\n' + boiler),  # leading blank paragraph filtered
        ]
        return spark.createDataFrame(rows, 'doc_id long, text string')

    def test_paragraph_duplicates(self, spark):
        from pybel_spark.textops import dedup

        groups = dedup.paragraph_duplicates(self._df(spark)).collect()
        assert len(groups) == 1
        g = groups[0]
        assert g['n_occurrences'] == 5  # doc2 contains it twice
        assert g['n_docs'] == 4
        assert g['keep_doc_id'] == 0

    def test_paragraph_dedup_keeps_first_occurrence(self, spark):
        from pybel_spark.textops import dedup

        out = {r['doc_id']: r['text']
               for r in dedup.paragraph_dedup(self._df(spark)).collect()}
        assert out[0] == ('unique alpha text\n\nsubscribe to the newsletter'
                          '\n\nmore alpha words')
        assert out[1] == 'unique beta text'      # boilerplate removed
        assert out[2] == 'unique gamma text'     # both copies removed
        assert 3 not in out                      # nothing survived


def test_band_signatures_rowwise_matches_groupby(spark, docs):
    """The shuffle-free row-wise band signatures must be bit-identical to
    the explode->groupBy formulation they replaced (and to the DuckDB
    oracle, which mirrors that formulation)."""
    from pyspark.sql import functions as F

    rows_per_band = 16 // 4
    sigs = dedup.minhash_signatures(docs, num_hashes=16)
    legacy = (
        sigs.withColumn('band', (F.col('k') / rows_per_band).cast('int'))
        .groupBy('doc_id', 'band')
        .agg(F.md5(F.concat_ws('|', F.sort_array(
            F.collect_list(F.concat_ws(':', F.col('k').cast('string'),
                                       'minhash'))))).alias('band_sig'))
    )
    want = {(r['doc_id'], r['band']): r['band_sig']
            for r in legacy.collect()}
    got = {(r['doc_id'], r['band']): r['band_sig']
           for r in dedup.band_signatures(docs, num_hashes=16,
                                          bands=4).collect()}
    assert got == want


def test_band_signatures_no_shuffle_plan(spark, docs):
    from pybel_spark.textops import dedup as _dedup

    plan = _dedup.band_signatures(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan


def test_cap_per_domain(spark):
    from pybel_spark.textops import urls

    rows = [(i, 'https://big.example.com/p/{}'.format(i), 'x')
            for i in range(300)]
    rows += [(1000 + i, 'https://small.other.net/p/{}'.format(i), 'x')
             for i in range(10)]
    docs = spark.createDataFrame(rows, 'doc_id long, url string, text string')

    capped = urls.cap_per_domain(docs, 50)
    kept = [r['doc_id'] for r in capped.collect()]
    small = [d for d in kept if d >= 1000]
    big = [d for d in kept if d < 1000]
    assert len(small) == 10                  # under-cap domain untouched
    assert 25 <= len(big) <= 80              # ~binomial around 50
    # deterministic: identical on rerun
    again = [r['doc_id'] for r in urls.cap_per_domain(docs, 50).collect()]
    assert sorted(again) == sorted(kept)

    exact = urls.cap_per_domain(docs, 50, exact=True).collect()
    by_domain = {}
    for r in exact:
        key = r['doc_id'] >= 1000
        by_domain[key] = by_domain.get(key, 0) + 1
    assert by_domain[False] == 50            # exactly the cap
    assert by_domain[True] == 10


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over a structured zoo of
    urls — the property that makes canonical urls usable as stable keys."""
    from pybel_spark.textops import urls

    rows = []
    i = 0
    for scheme in ('http', 'https', 'FTP'):
        for host in ('A.B.example.COM:8080', 'x.co.uk', 'example.com'):
            for path in ('', '/', '/a/', '/a/b.html'):
                for q in ('', '?utm_source=1', '?b=2&utm_a=1&a=1', '?a='):
                    for frag in ('', '#x'):
                        rows.append((i, '{}://{}{}{}{}'.format(
                            scheme, host, path, q, frag)))
                        i += 1
    docs = spark.createDataFrame(rows, 'doc_id long, url string')
    once = urls.parse_urls(docs).select(
        'doc_id', F.col('canonical_url').alias('url'))
    twice = urls.parse_urls(once).select('doc_id', 'canonical_url')
    joined = once.join(twice, on='doc_id')
    bad = joined.where(F.col('url') != F.col('canonical_url')).collect()
    assert bad == [], bad[:5]


class TestBandIndex:
    """Persisted band index: incremental near-dup without recomputing the
    historical corpus; union of (cross, within-batch) candidates equals
    the batch self-join over the full corpus."""

    def test_incremental_equals_batch(self, spark, docs):
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix='pybel_spark_bandidx_')
        try:
            old = docs.where(F.col('doc_id') <= 3)
            new = docs.where(F.col('doc_id') > 3)
            dedup.band_index_write(old, base)

            got = {(r['doc_a'], r['doc_b']) for r in
                   dedup.dedup_against_index(new, base).collect()}
            want_all = {tuple(sorted((r['doc_a'], r['doc_b']))) for r in
                        dedup.minhash_lsh_candidates(docs).collect()}
            old_ids = {0, 1, 2, 3}
            want = {p for p in want_all
                    if not (p[0] in old_ids and p[1] in old_ids)}
            assert {tuple(sorted(p)) for p in got} == want
            # cross pairs put the historical doc first
            for a, b in got:
                if a in old_ids or b in old_ids:
                    assert a in old_ids and b not in old_ids

            # steady-state: append survivors, a re-probe of an identical
            # batch now collides with them
            dedup.band_index_append(new, base)
            again = dedup.dedup_against_index(new, base)
            assert again.count() >= len(got)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_probe_reads_are_partition_pruned(self, spark, docs):
        """Joining on the band partition column keeps the scan prunable;
        the sidecar pins signature params so probes can't mismatch."""
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix='pybel_spark_bandidx_')
        try:
            dedup.band_index_write(docs, base, bands=8, num_hashes=16)
            p = dedup._band_index_params(spark, base)
            assert p == {'n': 3, 'num_hashes': 16, 'bands': 8}
            new = docs.limit(2)
            pairs = dedup.dedup_against_index(new, base)
            plan = pairs._jdf.queryExecution().executedPlan().toString()
            assert 'PartitionFilters' in plan
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestDuplicateSpans:
    """Exact-substring dedup: duplicated k-gram spans across documents,
    merged to maximal spans, plus the cut rewrite."""

    def _df(self, spark):
        shared = 'the quick brown fox jumps over the lazy sleeping dog'  # 10 tokens
        rows = [
            (0, 'alpha one two three ' + shared + ' tail zero end here'),
            (1, 'beta four five ' + shared + ' different ending words'),
            (2, 'gamma text with no duplicated material at all in it '
                'padding padding2 padding3 padding4'),
        ]
        return spark.createDataFrame(rows, 'doc_id long, text string')

    def test_spans_found_and_maximal(self, spark):
        from pybel_spark.textops import dedup

        spans = dedup.duplicate_spans(self._df(spark), k=10)
        got = {r['doc_id']: (r['span_start'], r['span_end_excl'])
               for r in spans.collect()}
        # doc0: shared starts at token 4; doc1: at token 3 — exactly the
        # 10 shared tokens, merged to ONE maximal span each
        assert got == {0: (4, 14), 1: (3, 13)}
        assert spans.count() == 2

    def test_within_document_repeat_counts(self, spark):
        from pybel_spark.textops import dedup

        text = ' '.join(['w{}'.format(i) for i in range(10)])
        df = spark.createDataFrame(
            [(0, text + ' filler ' + text)], 'doc_id long, text string')
        spans = dedup.duplicate_spans(df, k=10).collect()
        assert len(spans) == 2  # both copies are duplicated spans

    def test_cut_rewrite(self, spark):
        from pybel_spark.textops import dedup

        out = {r['doc_id']: r['text']
               for r in dedup.cut_duplicate_spans(
                   self._df(spark), k=10).collect()}
        assert out[0] == 'alpha one two three tail zero end here'
        assert out[1] == 'beta four five different ending words'
        assert 'no duplicated material' in out[2]  # untouched

    def test_no_false_positives_below_k(self, spark):
        from pybel_spark.textops import dedup

        # 9 shared tokens < k=10 → no span
        shared = 'a b c d e f g h i'
        df = spark.createDataFrame(
            [(0, 'x0 x1 x2 ' + shared + ' y0 y1 y2 y3 y4 y5 y6'),
             (1, 'z0 z1 z2 ' + shared + ' w0 w1 w2 w3 w4 w5 w6')],
            'doc_id long, text string')
        assert dedup.duplicate_spans(df, k=10).count() == 0

    def test_cut_pathological_span_dense_doc(self, spark):
        """1000 disjoint duplicated spans in ONE document: the sorted-gap
        merge must produce exactly the unique separator tokens, in order
        (the r4 per-token exists scan was quadratic here — r5 rewrite is
        linear in tokens + spans)."""
        from pybel_spark.textops import dedup

        k = 10
        dup_block = ' '.join('d{}'.format(i) for i in range(k))
        # victim doc: 1000 copies of the duplicated block, each followed
        # by a UNIQUE separator token that must survive the cut
        parts = []
        for s in range(1000):
            parts.append(dup_block)
            parts.append('sep{}'.format(s))
        victim = ' '.join(parts)
        # partner doc: one more copy so the block is corpus-duplicated
        # (the within-doc repeats already make it hot, but be explicit)
        df = spark.createDataFrame(
            [(0, victim), (1, dup_block + ' zfiller0 zfiller1')],
            'doc_id long, text string')
        out = {r['doc_id']: r['text']
               for r in dedup.cut_duplicate_spans(df, k=k).collect()}
        assert out[0] == ' '.join('sep{}'.format(s) for s in range(1000))
        assert out[1] == 'zfiller0 zfiller1'


class TestQualityClassifier:
    """Learned quality filter: train on labeled seed docs, score the
    corpus, filter by threshold."""

    def _labeled_corpus(self, spark):
        rows = []
        for i in range(40):  # clean prose-like docs → label 1
            rows.append((i, 'the data engine processes documents with '
                            'careful quality signals and it is robust '
                            'for large corpora in production use today',
                         1))
        for i in range(40, 80):  # spammy repetition → label 0
            rows.append((i, ('buy now ' * 20).strip(), 0))
        docs = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], 'doc_id long, text string')
        labels = spark.createDataFrame(
            [(i, y) for i, _, y in rows], 'doc_id long, label int')
        return docs, labels

    def test_train_score_filter(self, spark):
        from pybel_spark.textops import classifier

        docs, labels = self._labeled_corpus(spark)
        # train on a subset; score everything
        model = classifier.train_quality_classifier(
            docs, labels.where('doc_id % 2 = 0'))
        probs = {r['doc_id']: r['quality_prob']
                 for r in classifier.score_quality(docs, model).collect()}
        clean = [probs[i] for i in range(40)]
        spam = [probs[i] for i in range(40, 80)]
        assert min(clean) > max(spam)  # separable by construction

        kept = classifier.filter_by_model(docs, model, threshold=0.5)
        assert {r['doc_id'] for r in kept.collect()} == set(range(40))

    def test_feature_table_columns(self, spark):
        from pybel_spark.textops import classifier

        docs, _ = self._labeled_corpus(spark)
        feats = classifier.feature_table(docs)
        for c in classifier.FEATURE_COLS:
            assert c in feats.columns, c
        assert feats.count() == docs.count()


def test_token_budget_approx_null_quality_goes_to_bottom_bin(spark):
    """Empty-text docs (NULL quality) must never be promoted into the
    top histogram bin (code-review r4: F.least skips nulls)."""
    from pybel_spark.textops import mixture

    rows = [(i, 's', 'the data engine runs fine with many good tokens '
                     'in this document for scoring') for i in range(10)]
    rows += [(100 + i, 's', '') for i in range(5)]  # NULL-quality docs
    docs = spark.createDataFrame(rows, 'doc_id long, source string, text string')
    kept = mixture.token_budget_select_approx(docs, budget_per_source=60)
    ids = {r['doc_id'] for r in kept.collect()}
    assert ids and all(i < 100 for i in ids)  # only real docs selected


def test_classifier_handles_null_text(spark):
    """Null-text docs must score (low), not crash VectorAssembler
    (code-review r4: fillna(0.0) skips integer columns)."""
    from pybel_spark.textops import classifier

    rows = [(i, 'clean prose with the quality words and structure here '
                'for the model to learn from today', 1) for i in range(20)]
    rows += [(100 + i, ('spam spam ' * 15).strip(), 0) for i in range(20)]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows],
                                 'doc_id long, text string')
    labels = spark.createDataFrame([(i, y) for i, _, y in rows],
                                   'doc_id long, label int')
    model = classifier.train_quality_classifier(docs, labels)
    with_null = docs.unionByName(spark.createDataFrame(
        [(999, None)], 'doc_id long, text string'))
    probs = {r['doc_id']: r['quality_prob']
             for r in classifier.score_quality(with_null, model).collect()}
    assert 999 in probs  # scored, not crashed


def test_canonical_url_keeps_nondefault_ports(spark):
    """host:8080 and host are distinct origins (code-review r4)."""
    from pybel_spark.textops import urls

    df = spark.createDataFrame(
        [(0, 'http://example.com:8080/x'),
         (1, 'http://example.com/x'),
         (2, 'http://example.com:80/x'),       # default -> dropped
         (3, 'https://example.com:443/x')],    # default -> dropped
        'doc_id long, url string')
    canon = {r['doc_id']: r['canonical_url']
             for r in urls.parse_urls(df).collect()}
    assert canon[0] == 'http://example.com:8080/x'
    assert canon[1] == 'http://example.com/x'
    assert canon[0] != canon[1]
    assert canon[2] == canon[1]
    assert canon[3] == 'https://example.com/x'


def test_cosine_zero_vector_yields_zero_not_error(spark):
    """A zero/placeholder embedding must not kill the job under ANSI
    mode (divide-by-zero): its similarity to everything is 0.0."""
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0]), (2, [1.0, 1.0, 0.0])]
    vecs = spark.createDataFrame(rows, 'vec_id long, embedding array<double>')
    out = similarity.cosine_topk(vecs, k=2).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r['vec_id'], []).append(r)
    # the zero vector scores 0 against everyone but the query completes
    assert {r['neighbor_id'] for r in by_query[1]} <= {0, 2}
    sims = {(r['vec_id'], r['neighbor_id']): r['similarity'] for r in out}
    assert sims[(0, 1)] == 0.0 and sims[(1, 0)] == 0.0


class TestSimilarityRobustness:
    """code-review r4 regressions: zero vectors, non-long ids, external
    query filtering, empty inputs."""

    def test_ivf_survives_zero_vector(self, spark):
        rows = [(i, [float(i % 7 + 1), float(i % 3), 1.0])
                for i in range(40)]
        rows.append((99, [0.0, 0.0, 0.0]))  # placeholder embedding
        vecs = spark.createDataFrame(
            rows, 'vec_id long, embedding array<double>')
        assignments, _ = similarity.ivf_assignments(
            vecs, n_lists=4, refine_iterations=1)
        n_lists_used = assignments.select('list_id').distinct().count()
        assert n_lists_used > 1  # NaN centroid would collapse all to one
        out = similarity.ivf_topk(vecs, k=3, n_lists=4,
                                  query_ids=[0, 99]).collect()
        assert out  # completes; zero vector scores 0 everywhere

    def test_ivf_string_ids(self, spark):
        rows = [('doc{}'.format(i), [float(i + 1), 1.0]) for i in range(12)]
        vecs = spark.createDataFrame(
            rows, 'vec_id string, embedding array<double>')
        out = similarity.ivf_topk(vecs, k=2, n_lists=2,
                                  query_ids=['doc0', 'doc5']).collect()
        assert {r['vec_id'] for r in out} == {'doc0', 'doc5'}

    def test_ivf_index_external_queries_respect_query_ids(self, spark,
                                                          tmp_path):
        rows = [(i, [float(i + 1), 1.0]) for i in range(16)]
        vecs = spark.createDataFrame(
            rows, 'vec_id long, embedding array<float>')
        path = str(tmp_path / 'ivf')
        similarity.ivf_index_write(vecs, path, n_lists=2)
        external = spark.createDataFrame(
            [(100, [3.0, 1.0]), (101, [9.0, 1.0]), (102, [1.0, 5.0])],
            'vec_id long, embedding array<float>')
        out = similarity.ivf_index_topk(
            spark, path, k=2, queries=external, query_ids=[100, 102])
        got_ids = {r['vec_id'] for r in out.collect()}
        assert got_ids == {100, 102}  # 101 filtered out, not ignored

    def test_lsh_empty_input(self, spark):
        empty = spark.createDataFrame(
            [], 'vec_id long, embedding array<double>')
        assert similarity.lsh_signatures(empty).count() == 0
        assert similarity.lsh_topk(empty, k=3).count() == 0


class TestNgramPerplexity:
    """CCNet-style n-gram LM perplexity filter (textops.ngram_lm)."""

    def _corpora(self, spark):
        ref_rows = [(i, 'the engine reads the data and the engine writes '
                        'the data') for i in range(20)]
        ref = spark.createDataFrame(ref_rows, 'doc_id long, text string')
        test_rows = [
            (0, 'the engine reads the data'),              # in-distribution
            (1, 'zq xv qqj kpl wmo zzv'),                  # out-of-distribution
            (2, 'the engine writes the data'),             # in-distribution
        ]
        return ref, spark.createDataFrame(test_rows, 'doc_id long, text string')

    def test_perplexity_orders_by_distribution_fit(self, spark):
        from pybel_spark.textops import ngram_lm

        ref, test = self._corpora(spark)
        lm = ngram_lm.train_ngram_lm(ref)
        ppl = {r['doc_id']: r['perplexity']
               for r in ngram_lm.score_perplexity(test, lm).collect()}
        assert ppl[0] < ppl[1] and ppl[2] < ppl[1]
        assert all(p > 0 for p in ppl.values())

        kept = ngram_lm.filter_by_perplexity(
            test, lm, max_perplexity=(ppl[0] + ppl[1]) / 2)
        assert {r['doc_id'] for r in kept.collect()} == {0, 2}

    def test_matches_python_recomputation(self, spark):
        """Bit-level check of the smoothing formula on a tiny model."""
        import math

        from pybel_spark.textops import ngram_lm

        ref = spark.createDataFrame([(0, 'a b a b a c')],
                                    'doc_id long, text string')
        lm = ngram_lm.train_ngram_lm(ref)
        counts = {(r['context'], r['word']): r['c'] for r in lm.collect()}
        # model: (<s>,a):1 (a,b):2 (b,a):2 (a,c):1
        assert counts == {('<s>', 'a'): 1, ('a', 'b'): 2, ('b', 'a'): 2,
                          ('a', 'c'): 1}
        V = ngram_lm.lm_vocab_size(lm)  # {a,b,c} + 1 = 4
        assert V == 4
        test = spark.createDataFrame([(9, 'a b x')], 'doc_id long, text string')
        got = ngram_lm.score_perplexity(test, lm, vocab_size=V).collect()[0]
        ctx_tot = {'<s>': 1, 'a': 3, 'b': 2}
        logps = [
            math.log((1 + 1) / (ctx_tot['<s>'] + V)),  # <s> a  (seen)
            math.log((2 + 1) / (ctx_tot['a'] + V)),    # a b    (seen)
            math.log((0 + 1) / (ctx_tot['b'] + V)),    # b x    (unseen word)
        ]
        want = round(math.exp(-sum(logps) / len(logps)), 6)
        assert got['n_scored'] == 3
        assert abs(got['perplexity'] - want) < 1e-6


def test_source_divergence_detects_drift(spark):
    """A source writing from a different vocabulary diverges more from
    the corpus blend than sources sharing the common distribution."""
    from pybel_spark.textops import ngram_lm

    rows = []
    for i in range(30):
        rows.append((i, 'common', 'the data engine runs the data jobs'))
    for i in range(30, 60):
        rows.append((i, 'alike', 'the data engine runs the data tasks'))
    for i in range(60, 90):
        rows.append((i, 'weird', 'zq qx jv kk wv pp mm nn'))
    docs = spark.createDataFrame(rows, 'doc_id long, source string, text string')
    kl = {r['source']: r['kl_divergence']
          for r in ngram_lm.source_divergence(docs).collect()}
    assert kl['weird'] > kl['common'] and kl['weird'] > kl['alike']
    assert all(v >= 0 or abs(v) < 1e-9 for v in kl.values())


def test_parse_urls_degenerate_inputs(spark):
    """Degenerate urls (no scheme, empty, null, IPv6, bare scheme) flow
    through as empty-string fields — never exceptions or nulls that
    would poison downstream group keys."""
    from pybel_spark.textops import urls

    rows = [(0, None), (1, ''), (2, 'not a url at all'),
            (3, 'https://'), (4, 'ftp://[::1]:21/x'),
            (5, '//protocol-relative.example/x'), (6, 'mailto:a@b.c')]
    df = spark.createDataFrame(rows, 'doc_id long, url string')
    out = {r['doc_id']: r for r in urls.parse_urls(df).collect()}
    assert out[0]['host'] is None      # null url stays null
    for i in (1, 2, 3, 5, 6):
        assert out[i]['host'] == ''    # unparseable -> empty, not crash
        assert out[i]['domain'] == ''
    assert out[4]['scheme'] == 'ftp'   # IPv6 host: scheme still extracted
    # degenerate rows never collide with real canonical urls
    real = urls.parse_urls(spark.createDataFrame(
        [(9, 'https://example.com/x')], 'doc_id long, url string')).collect()[0]
    assert all(out[i]['canonical_url'] != real['canonical_url']
               for i in (1, 2, 3, 5, 6))
