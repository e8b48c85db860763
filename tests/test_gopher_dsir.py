"""Gopher quality rules (quality.gopher_*) and DSIR importance
resampling (textops/dsir.py): hand-computed feature values, rule
behavior, determinism, and the resampling-enriches-target property."""
import math

import pytest
from pyspark.sql import functions as F

from pybel_spark.textops import dsir
from pybel_spark.textops.quality import (
    GOPHER_STOPWORDS, gopher_features, gopher_filter,
)


def _features(spark, text):
    df = spark.createDataFrame([(1, text)], 'doc_id int, text string')
    return gopher_features(df).collect()[0].asDict()


def test_gopher_basic_counts(spark):
    f = _features(spark, 'the cat sat on the mat')
    assert f['n_words'] == 6
    # chars: 3+3+3+2+3+3 = 17
    assert f['mean_word_len'] == pytest.approx(17 / 6)
    assert f['alpha_word_frac'] == 1.0
    # 'the' is the only Gopher stopword present
    assert f['n_stop_words'] == 1
    assert f['symbol_word_ratio'] == 0.0


def test_gopher_top_bigram_fraction(spark):
    # bigrams of 'a b a b a': 'a b'×2, 'b a'×2 → every bigram duplicated;
    # total bigram mass = 4 grams × 2 chars = 8, top = 2×2 = 4
    f = _features(spark, 'a b a b a')
    assert f['top_2gram_char_frac'] == pytest.approx(4 / 8)


def test_gopher_dup_5gram_pure_repetition(spark):
    # 'x x x x x x' → two 5-gram windows, both 'x x x x x' (count 2):
    # the whole gram mass is duplicated
    f = _features(spark, 'x x x x x x')
    assert f['dup_5gram_char_frac'] == 1.0
    # only one 6-gram window → count 1 → no duplication
    assert f['dup_6gram_char_frac'] == 0.0


def test_gopher_short_doc_has_zero_ngram_fracs(spark):
    # 3 tokens: no 4-gram windows at all (no whole-text collapse)
    f = _features(spark, 'one two three')
    assert f['top_4gram_char_frac'] == 0.0
    assert f['dup_5gram_char_frac'] == 0.0


def test_gopher_line_features(spark):
    text = '- first\nbody line here\nrepeat me\nrepeat me'
    f = _features(spark, text)
    assert f['bullet_line_frac'] == pytest.approx(1 / 4)
    assert f['dup_line_frac'] == pytest.approx(1 / 4)
    # extra copies: 1 × len('repeat me')=9; total line chars 7+14+9+9=39
    assert f['dup_line_char_frac'] == pytest.approx(9 / 39)


def test_gopher_ellipsis_and_symbols(spark):
    f = _features(spark, 'read more ...\nsee also …')
    assert f['ellipsis_line_frac'] == 1.0
    # '...' counts 1, '…' counts 1, over 6 words
    assert f['symbol_word_ratio'] == pytest.approx(2 / 6)


def test_gopher_null_text_is_safe(spark):
    df = spark.createDataFrame([(1, None)], 'doc_id int, text string')
    row = gopher_features(df).collect()[0]
    assert row['n_words'] == 1  # split('') → ['']
    keep = gopher_filter(df).collect()[0]
    assert keep['keep'] is False


def test_gopher_filter_thresholds(spark):
    good = ('the quick brown fox jumps over the lazy dog and then it '
            'ran to be of note with that have more words here now '
            'plus extra filler words to clear the minimum bar okay '
            'final words land here today') * 1
    spammy = 'buy now ' * 40
    df = spark.createDataFrame(
        [(1, good), (2, spammy)], 'doc_id int, text string')
    out = {r['doc_id']: r['keep']
           for r in gopher_filter(df, min_words=20).collect()}
    assert out[1] is True
    assert out[2] is False  # dup n-gram mass ~1.0


def test_gopher_stopword_list_is_the_paper_set(spark):
    assert GOPHER_STOPWORDS == ['the', 'be', 'to', 'of', 'and', 'that',
                                'have', 'with']


def test_dsir_bucket_range(spark):
    df = spark.createDataFrame(
        [(i, 'word{} tok'.format(i)) for i in range(50)],
        'doc_id int, text string')
    buckets = (dsir.bucket_distribution(df, n_buckets=64)
               .agg(F.min('bucket'), F.max('bucket')).collect()[0])
    assert buckets[0] >= 0 and buckets[1] < 64


def test_dsir_weights_favor_target_vocabulary(spark):
    raw = [(i, 'common filler junk page spam text') for i in range(20)]
    tgt_like = [(100 + i, 'science theorem proof lemma') for i in range(5)]
    docs = spark.createDataFrame(raw + tgt_like, 'doc_id int, text string')
    target = docs.filter(F.col('doc_id') >= 100)
    w = {r['doc_id']: r['log_weight']
         for r in dsir.dsir_log_weights(docs, target,
                                        n_buckets=256).collect()}
    assert all(w[100 + i] > 0 for i in range(5))
    assert all(w[i] < 0 for i in range(20))
    assert all(math.isfinite(v) for v in w.values())


def test_dsir_sample_enriches_target(spark):
    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text'))
    target = docs.filter(F.col('doc_id') % 4 == 0)
    sample = dsir.dsir_sample(docs, target, 50, n_buckets=512).collect()
    frac_target = sum(1 for r in sample if r['doc_id'] % 4 == 0) / 50
    assert frac_target > 0.5  # base rate 0.25


def test_dsir_sample_deterministic_and_seed_sensitive(spark):
    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text'))
    target = docs.filter(F.col('doc_id') % 4 == 0)
    a = [r['doc_id'] for r in
         dsir.dsir_sample(docs, target, 25, n_buckets=512, seed=0).collect()]
    b = [r['doc_id'] for r in
         dsir.dsir_sample(docs, target, 25, n_buckets=512, seed=0).collect()]
    c = [r['doc_id'] for r in
         dsir.dsir_sample(docs, target, 25, n_buckets=512, seed=7).collect()]
    assert a == b
    assert a != c


def test_dsir_temperature_flattens(spark):
    """High temperature → noise dominates → sample approaches uniform
    (still deterministic); compare overlap with the T=1 sample."""
    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text'))
    target = docs.filter(F.col('doc_id') % 4 == 0)
    hot = dsir.dsir_sample(docs, target, 50, n_buckets=512,
                           temperature=1000.0).collect()
    frac_target = sum(1 for r in hot if r['doc_id'] % 4 == 0) / 50
    assert frac_target < 0.5  # ≈ base rate under flat sampling


def test_gopher_plan_is_one_arrow_stage_no_shuffle(spark):
    docs = spark.createDataFrame([(1, 'a b c')], 'doc_id int, text string')
    plan = (gopher_features(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert 'Exchange' not in plan
    # exactly ONE Python (Arrow mapInPandas) stage computes all 18 features
    assert plan.count('MapInPandas') == 1


def test_gopher_arrow_matches_expression_variant(spark):
    """The Arrow stage and the pure column-expression variant are the same
    function: bit-exact on a battery of adversarial texts plus the real
    sf0.001 synthetic pages (the gate input shape)."""
    from pybel_spark.textops.quality import gopher_features_expr

    adversarial = [
        (1, None), (2, ''), (3, '   '), (4, '\n\n'), (5, 'word'),
        (6, 'a b a b a'), (7, 'x ' * 40),
        (8, '- bullet\n* star\n• dot\n\tno-tab-trim - x'),
        (9, 'ends ...\nends …\nends.. no'),
        (10, 'the be to of and that have with THE Be'),
        (11, '# ## ... .... …… mixed # text'),
        (12, 'dup line\ndup line\ndup line\nuniq'),
        (13, 'tab\tsep\x0bvert\fform\rcarriage mix'),
        (14, ' '.join('tok{}'.format(i % 7) for i in range(60))),
    ]
    df = spark.createDataFrame(adversarial, 'doc_id int, text string')
    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text').limit(30))
    for src in (df, docs):
        a = sorted(gopher_features(src).collect())
        b = sorted(gopher_features_expr(src).collect())
        assert a == b


def test_dsir_arrow_counts_match_explode_reference(spark):
    """The Arrow per-(doc,bucket) fold equals the explode→groupBy
    reference (_gram_stream) bit-for-bit, including empty/null text and
    single-token docs (no bigrams)."""
    rows = [(1, None), (2, ''), (3, 'one'), (4, 'a b a b a'),
            (5, 'The THE the mixed Case'),
            (6, 'tab\tand\nnewline\rsep'),
            (7, ' '.join('w{}'.format(i % 11) for i in range(80)))]
    df = spark.createDataFrame(rows, 'doc_id int, text string')
    arrow = sorted(dsir._doc_bucket_counts(df, 'doc_id', 'text', 64)
                   .collect())
    ref = sorted(
        dsir._gram_stream(df, 'doc_id', 'text')
        .select('doc_id',
                dsir.gram_bucket(F.col('gram'), 64).alias('bucket'))
        .groupBy('doc_id', 'bucket').agg(F.count('*').alias('n'))
        .collect())
    assert arrow == ref

    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text').limit(40))
    arrow = sorted(dsir._doc_bucket_counts(docs, 'doc_id', 'text', 512)
                   .collect())
    ref = sorted(
        dsir._gram_stream(docs, 'doc_id', 'text')
        .select('doc_id',
                dsir.gram_bucket(F.col('gram'), 512).alias('bucket'))
        .groupBy('doc_id', 'bucket').agg(F.count('*').alias('n'))
        .collect())
    assert arrow == ref


def test_dsir_scoring_plan_is_shuffle_free(spark):
    """The weight vector ships as a closure, so the scoring DataFrame's
    plan is scan → one Arrow stage: no join, no exchange at all."""
    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text'))
    target = docs.filter(F.col('doc_id') % 4 == 0)
    plan = (dsir.dsir_log_weights(docs, target, n_buckets=256)
            ._jdf.queryExecution().executedPlan().toString())
    assert 'Join' not in plan
    assert 'Exchange' not in plan
    assert plan.count('MapInPandas') == 1


class TestAssignSplits:
    def test_partition_is_total_and_disjoint(self, spark):
        from pybel_spark.textops.mixture import assign_splits
        docs = spark.range(2000).select(
            F.col('id').alias('doc_id'), F.lit('s').alias('source'))
        out = assign_splits(docs, {'train': 0.8, 'val': 0.1, 'test': 0.1})
        counts = {r['split']: r['n'] for r in out.groupBy('split')
                  .agg(F.count(F.lit(1)).alias('n')).collect()}
        assert sum(counts.values()) == 2000
        # approximate fractions (binomial noise ~ sqrt(n))
        assert abs(counts['train'] - 1600) < 120
        assert abs(counts.get('val', 0) - 200) < 70
        assert abs(counts.get('test', 0) - 200) < 70

    def test_deterministic_and_seed_sensitive(self, spark):
        from pybel_spark.textops.mixture import assign_splits
        docs = spark.range(300).select(F.col('id').alias('doc_id'))
        a = dict((r['doc_id'], r['split'])
                 for r in assign_splits(docs).collect())
        b = dict((r['doc_id'], r['split'])
                 for r in assign_splits(docs).collect())
        c = dict((r['doc_id'], r['split'])
                 for r in assign_splits(docs, seed='other').collect())
        assert a == b
        assert a != c

    def test_split_hash_independent_of_sampling_seed0(self, spark):
        """Composing stratified_sample(seed=0) with assign_splits must not
        correlate: survivors of a 50% sample still split ~80/10/10."""
        from pybel_spark.textops.mixture import (assign_splits,
                                                 stratified_sample)
        docs = spark.range(4000).select(
            F.col('id').alias('doc_id'), F.lit('s').alias('source'))
        kept = stratified_sample(docs, {'s': 0.5})
        n = kept.count()
        counts = {r['split']: r['n'] for r in
                  assign_splits(kept, {'train': 0.8, 'val': 0.1,
                                       'test': 0.1})
                  .groupBy('split').agg(F.count(F.lit(1)).alias('n'))
                  .collect()}
        assert abs(counts['train'] / n - 0.8) < 0.05


class TestLeakageSafeSplits:
    def test_clusters_never_span_splits(self, spark):
        from pybel_spark.textops.mixture import leakage_safe_splits
        docs = spark.range(500).select(F.col('id').alias('doc_id'))
        # clusters: docs 0-9 -> rep 0; 100-104 -> rep 100
        rows = [(i, 0) for i in range(10)] + [(i, 100) for i in
                                              range(100, 105)]
        clusters = spark.createDataFrame(
            rows, 'doc_id bigint, cluster_id bigint')
        out = leakage_safe_splits(docs, clusters,
                                  {'train': 0.6, 'val': 0.2, 'test': 0.2})
        by = {r['doc_id']: r['split'] for r in out.collect()}
        assert len(by) == 500
        assert len({by[i] for i in range(10)}) == 1
        assert len({by[i] for i in range(100, 105)}) == 1

    def test_singletons_match_assign_splits(self, spark):
        from pybel_spark.textops.mixture import (assign_splits,
                                                 leakage_safe_splits)
        docs = spark.range(300).select(F.col('id').alias('doc_id'))
        empty = spark.createDataFrame([], 'doc_id bigint, cluster_id bigint')
        a = {r['doc_id']: r['split'] for r in
             leakage_safe_splits(docs, empty).collect()}
        b = {r['doc_id']: r['split'] for r in
             assign_splits(docs).collect()}
        assert a == b


def test_doremi_upweights_reference_aligned_domain(spark):
    """DoReMi rounds: the domain the reference model covers well (low
    L_ref, positive excess under the uniform-start mixture) gains
    weight; the junk domain (high L_ref → excess clamped at 0) loses
    relative weight. Deterministic across reruns."""
    from pybel_spark.textops import mixture

    sci = 'theorem proof lemma corollary axiom derivation'
    web = 'click here buy now subscribe deal offer'
    junk = 'zq xv qq kjz vvx wpt zzz qxq'
    rows = ([(i, sci, 'sci') for i in range(20)]
            + [(100 + i, web, 'web') for i in range(20)]
            + [(200 + i, junk, 'junk') for i in range(20)])
    docs = spark.createDataFrame(
        rows, 'doc_id int, text string, source string')
    ref = docs.where(F.col('source') == 'sci').select(
        'doc_id', 'text', 'source')
    w = {r['source']: r['weight']
         for r in mixture.doremi_weights(docs, ref, n_rounds=4,
                                         n_buckets=256).collect()}
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert w['sci'] > w['junk']
    w2 = {r['source']: r['weight']
          for r in mixture.doremi_weights(docs, ref, n_rounds=4,
                                          n_buckets=256).collect()}
    assert w == w2
