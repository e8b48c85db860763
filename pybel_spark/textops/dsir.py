"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw web documents whose hashed-n-gram profile
looks like a TARGET corpus (e.g. Wikipedia-like pages), by importance
weights between two bag-of-hashed-n-grams unigram models.

Spark-first design for the 10^12-document shape:

- Features are hashed (uni+bi)grams over ``n_buckets`` buckets. The two
  bucket distributions are O(n_buckets)-row tables built by one
  map-side-combined groupBy each; the per-bucket log-ratio table is tiny
  and BROADCAST to the scoring join, so the raw corpus is never shuffled
  on a skewed key.
- Per-document log-weights need NO corpus-sized exchange: the two bucket
  histograms are collected (≤ n_buckets rows each), the log-ratio vector
  ships as a closure into the scoring Arrow stage, and scoring emits one
  row per document map-side.
- Gumbel-top-k resampling (logw + Gumbel noise, take k) samples WITHOUT
  replacement with probability ∝ exp(logw / temperature) — a TakeOrdered
  (no global sort). Noise is md5-derived from (seed, doc_id): fully
  deterministic and reproducible in any engine with md5.

Every hash is md5-based (bucket = first 8 hex chars mod n_buckets;
uniform = first 13 hex chars / 2^52) so a SQL oracle reproduces weights
and the sample bit-for-bit. The only Python stage is the Arrow-batched
_doc_bucket_counts fold (occurrence counting never leaves C level);
everything downstream is JVM column algebra.
"""
from pyspark.sql import Column, DataFrame, functions as F

#: default hashed-feature space (the paper uses 10^4; power of two here)
DEFAULT_BUCKETS = 8192


def _lower_tokens(text_col: str) -> Column:
    return F.transform(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(''))), r'\s+'),
        F.lower)


def _gram_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, gram) with one row per unigram AND bigram occurrence.
    Pure column-expression reference for _doc_bucket_counts (kept for
    cross-validation tests); the production path folds occurrences inside
    the Arrow stage instead of exploding them into rows."""
    toks = docs.select(F.col(id_col).alias('doc_id'),
                       _lower_tokens(text_col).alias('_t'))
    t = F.col('_t')
    n = F.size(t)
    unigrams = t
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(' ', F.slice(t, i + 1, 2)),
    )).otherwise(F.array().cast('array<string>'))
    return toks.select(
        'doc_id', F.explode(F.concat(unigrams, bigrams)).alias('gram'))


def gram_bucket(gram: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Engine-portable hash bucket: first 8 md5 hex chars as an integer,
    mod ``n_buckets`` (non-negative; 32-bit value fits a long exactly)."""
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast('long')
            % n_buckets)


def _doc_bucket_counts(docs: DataFrame, id_col: str, text_col: str,
                       n_buckets: int,
                       combine_keys: bool = False) -> DataFrame:
    """(doc_id, bucket, n) hashed-gram profile per document as ONE Arrow
    mapInPandas stage — the fold of _gram_stream's explode→groupBy.

    The gram OCCURRENCE stream (≈2× token count per doc) never becomes
    rows: per batch, a gram→bucket cache means md5 runs once per
    BATCH-DISTINCT gram (vocabulary-sized, not corpus-sized), and
    per-occurrence counting is C-level (dict-getter map → Counter).
    Each document lands wholly in one Arrow batch, so the emitted counts
    are complete — no per-doc exchange is needed downstream; output size
    is Σ min(grams_d, n_buckets) rows. Bucket = first 8 md5 hex chars of
    the utf-8 gram mod n_buckets, digit-for-digit the gram_bucket column
    (and the DuckDB oracle).

    ``combine_keys=True`` accumulates ONE counter per distinct id value
    per batch instead of per row — for low-cardinality keys (a 20-way
    ``source`` domain label) the stage then emits ≤ K×n_buckets rows per
    batch instead of one run per document, collapsing the downstream
    partial-agg input by orders of magnitude (DoReMi's shape). Counts
    are then per-(key, batch) partials, so a groupBy(key) rollup is
    still required downstream."""
    from pyspark.sql import types as T

    from .quality import _JAVA_WS_RE

    id_field = docs.schema[id_col]
    out_schema = T.StructType([
        T.StructField('doc_id', id_field.dataType, id_field.nullable),
        T.StructField('bucket', T.LongType(), False),
        T.StructField('n', T.LongType(), False),
    ])
    src = docs.select(
        F.col(id_col).alias('doc_id'),
        F.coalesce(F.col(text_col), F.lit('')).alias('__text'))

    def compute(batches):
        import hashlib
        from collections import Counter

        import pandas as pd

        def bucket_of(gram):
            return int(
                hashlib.md5(gram.encode('utf-8')).hexdigest()[:8],
                16) % n_buckets

        for pdf in batches:
            uni_cache = {}
            bi_cache = {}
            ids, buckets, ns = [], [], []
            combined = {}
            for doc_id, text in zip(pdf['doc_id'], pdf['__text']):
                toks = [t.lower() for t in
                        _JAVA_WS_RE.split(text.strip(' '))]
                for t in set(toks).difference(uni_cache):
                    uni_cache[t] = bucket_of(t)
                pairs = list(zip(toks, toks[1:]))
                for p in set(pairs).difference(bi_cache):
                    bi_cache[p] = bucket_of(p[0] + ' ' + p[1])
                if combine_keys:
                    cnt = combined.get(doc_id)
                    if cnt is None:
                        cnt = combined[doc_id] = Counter()
                else:
                    cnt = Counter()
                cnt.update(map(uni_cache.__getitem__, toks))
                cnt.update(map(bi_cache.__getitem__, pairs))
                if not combine_keys:
                    ids.extend([doc_id] * len(cnt))
                    buckets.extend(cnt.keys())
                    ns.extend(cnt.values())
            for doc_id, cnt in combined.items():
                ids.extend([doc_id] * len(cnt))
                buckets.extend(cnt.keys())
                ns.extend(cnt.values())
            yield pd.DataFrame({
                'doc_id': pd.Series(ids, dtype=pdf['doc_id'].dtype),
                'bucket': pd.Series(buckets, dtype='int64'),
                'n': pd.Series(ns, dtype='int64')})

    return src.mapInPandas(compute, out_schema)


def bucket_distribution(docs: DataFrame, id_col='doc_id', text_col='text',
                        n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(bucket, cnt) hashed-gram histogram — at most ``n_buckets`` rows.
    ``id_col`` is accepted for signature compatibility but unused: the
    Arrow stage folds the whole batch into one counter (constant key),
    so each batch emits ≤ n_buckets partial rows regardless of corpus
    size."""
    keyed = docs.select(F.lit(0).cast('long').alias('__k'),
                        F.col(text_col).alias('__t'))
    return (_doc_bucket_counts(keyed, '__k', '__t', n_buckets,
                               combine_keys=True)
            .groupBy('bucket').agg(F.sum('n').alias('cnt')))


def dsir_log_weights(docs: DataFrame, target: DataFrame,
                     id_col='doc_id', text_col='text',
                     n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(doc_id, log_weight): log p_target(doc) − log p_raw(doc) under
    add-one-smoothed hashed-gram unigram models.

    p_X(bucket) = (cnt_X[bucket] + 1) / (total_X + n_buckets);
    log_weight(doc) = Σ_{gram occurrences} ln p_t(bucket) − ln p_r(bucket).

    The raw model is fit on ``docs`` itself (the paper fits it on a raw
    sample; pass a sample for that). The per-bucket weight table is
    n_buckets floats — collected to the driver and shipped as a closure
    vector into the scoring Arrow stage, which emits exactly one row per
    document. No corpus-sized exchange anywhere: the only shuffles are
    the two ≤n_buckets-row histogram rollups.
    """
    import numpy as np

    # two tiny histogram jobs (≤ n_buckets rows each) collected to the
    # driver; the per-bucket log-ratio becomes a CLOSURE vector, so the
    # scoring pass is one Arrow stage emitting exactly one row per doc —
    # no per-doc materialization, no weight join, no groupBy exchange.
    # At 10^12 docs this plan is two map-side histogram rollups plus one
    # map pass; the only exchanges carry ≤ n_buckets×partitions rows.
    def _totals(dist_rows):
        cnts = np.zeros(n_buckets, dtype=np.int64)
        for r in dist_rows:
            cnts[r['bucket']] = r['cnt']
        return cnts

    r_cnt = _totals(
        bucket_distribution(docs, id_col, text_col, n_buckets).collect())
    t_cnt = _totals(
        bucket_distribution(target, id_col, text_col, n_buckets).collect())
    # same expression shape as the SQL oracle — ln((c+1)/(tot+B)) per
    # model, NOT ln(c+1)−ln(tot+B): the two differ in the last float bits
    r_tot = float(int(r_cnt.sum()) + n_buckets)
    t_tot = float(int(t_cnt.sum()) + n_buckets)
    w = (np.log((t_cnt + 1).astype('float64') / t_tot)
         - np.log((r_cnt + 1).astype('float64') / r_tot))

    from pyspark.sql import types as T

    id_field = docs.schema[id_col]
    out_schema = T.StructType([
        T.StructField('doc_id', id_field.dataType, id_field.nullable),
        T.StructField('log_weight', T.DoubleType(), False),
    ])
    src = docs.select(
        F.col(id_col).alias('doc_id'),
        F.coalesce(F.col(text_col), F.lit('')).alias('__text'))

    def score(batches):
        import hashlib
        from collections import Counter

        import pandas as pd

        from pybel_spark.textops.quality import _JAVA_WS_RE

        def bucket_of(gram):
            return int(
                hashlib.md5(gram.encode('utf-8')).hexdigest()[:8],
                16) % n_buckets

        for pdf in batches:
            uni_cache, bi_cache = {}, {}
            out = np.empty(len(pdf), dtype='float64')
            for row_i, text in enumerate(pdf['__text']):
                toks = [t.lower() for t in
                        _JAVA_WS_RE.split(text.strip(' '))]
                for t in set(toks).difference(uni_cache):
                    uni_cache[t] = bucket_of(t)
                pairs = list(zip(toks, toks[1:]))
                for p in set(pairs).difference(bi_cache):
                    bi_cache[p] = bucket_of(p[0] + ' ' + p[1])
                cnt = Counter(map(uni_cache.__getitem__, toks))
                cnt.update(map(bi_cache.__getitem__, pairs))
                b = np.fromiter(cnt.keys(), np.int64, count=len(cnt))
                n = np.fromiter(cnt.values(), np.int64, count=len(cnt))
                out[row_i] = float((w[b] * n).sum())
            yield pd.DataFrame({'doc_id': pdf['doc_id'],
                                'log_weight': out})

    return src.mapInPandas(score, out_schema)


def gumbel_noise(id_col: Column, seed: int = 0) -> Column:
    """Deterministic standard-Gumbel noise from md5(seed ':' id): the
    first 13 hex chars are 52 uniform bits; u = (bits + 0.5) / 2^52 is
    strictly inside (0, 1), so −ln(−ln(u)) is always finite."""
    bits = F.conv(
        F.substring(
            F.md5(F.concat_ws(':', F.lit(str(seed)),
                              id_col.cast('string'))), 1, 13),
        16, 10).cast('double')
    u = (bits + F.lit(0.5)) / F.lit(float(2 ** 52))
    return -F.log(-F.log(u))


def dsir_sample(docs: DataFrame, target: DataFrame, k: int,
                id_col='doc_id', text_col='text',
                n_buckets: int = DEFAULT_BUCKETS, temperature: float = 1.0,
                seed: int = 0) -> DataFrame:
    """Gumbel-top-k importance resample: the ``k`` documents maximizing
    log_weight / temperature + Gumbel(seed, doc_id) — an exact
    without-replacement sample ∝ exp(log_weight / temperature).

    Returns (doc_id, log_weight, sample_key) for the selected documents.
    orderBy().limit(k) compiles to TakeOrdered — per-partition top-k then
    a k-row driver merge, no global sort at corpus scale.
    """
    logw = dsir_log_weights(docs, target, id_col, text_col, n_buckets)
    keyed = logw.select(
        'doc_id', 'log_weight',
        (F.col('log_weight') / F.lit(float(temperature))
         + gumbel_noise(F.col('doc_id'), seed)).alias('sample_key'))
    return keyed.orderBy(F.desc('sample_key'), 'doc_id').limit(k)
