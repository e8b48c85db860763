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
- Per-document log-weights need one exchange: groupBy(doc_id) over the
  gram stream with map-side partial sums (the exchange carries one
  partial row per doc per partition, not one row per gram).
- Gumbel-top-k resampling (logw + Gumbel noise, take k) samples WITHOUT
  replacement with probability ∝ exp(logw / temperature) — a TakeOrdered
  (no global sort). Noise is md5-derived from (seed, doc_id): fully
  deterministic and reproducible in any engine with md5.

Every hash is md5-based (bucket = first 8 hex chars mod n_buckets;
uniform = first 13 hex chars / 2^52) so a SQL oracle reproduces weights
and the sample bit-for-bit. No Python UDFs anywhere.
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
    Two-phase projection (tokens as a real attribute) to keep the window
    transforms inside one codegen stage without re-splitting."""
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


def bucket_distribution(docs: DataFrame, id_col='doc_id', text_col='text',
                        n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(bucket, cnt) hashed-gram histogram — at most ``n_buckets`` rows."""
    grams = _gram_stream(docs, id_col, text_col)
    return (grams.select(gram_bucket(F.col('gram'), n_buckets)
                         .alias('bucket'))
            .groupBy('bucket').agg(F.count('*').alias('cnt')))


def dsir_log_weights(docs: DataFrame, target: DataFrame,
                     id_col='doc_id', text_col='text',
                     n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(doc_id, log_weight): log p_target(doc) − log p_raw(doc) under
    add-one-smoothed hashed-gram unigram models.

    p_X(bucket) = (cnt_X[bucket] + 1) / (total_X + n_buckets);
    log_weight(doc) = Σ_{gram occurrences} ln p_t(bucket) − ln p_r(bucket).

    The raw model is fit on ``docs`` itself (the paper fits it on a raw
    sample; pass a sample for that). The per-bucket weight table is
    n_buckets rows → broadcast; the only corpus-sized exchange is the
    map-side-combined groupBy(doc_id).
    """
    spark = docs.sparkSession
    # ONE pass over the corpus gram stream: per-(doc, bucket) counts are
    # materialized once and feed BOTH the raw distribution (a tiny rollup)
    # and the scoring join — previously the stream (split + bigram build +
    # one md5 per gram occurrence) ran twice over the full corpus
    per_doc = (
        _gram_stream(docs, id_col, text_col)
        .select('doc_id',
                gram_bucket(F.col('gram'), n_buckets).alias('bucket'))
        .groupBy('doc_id', 'bucket').agg(F.count('*').alias('n'))
        .localCheckpoint(eager=True)
    )
    raw_dist = per_doc.groupBy('bucket').agg(F.sum('n').alias('cnt'))
    tgt_dist = bucket_distribution(target, id_col, text_col, n_buckets)
    spine = spark.range(n_buckets).select(F.col('id').alias('bucket'))
    w = (
        spine
        .join(raw_dist.withColumnRenamed('cnt', 'r_cnt'), 'bucket', 'left')
        .join(tgt_dist.withColumnRenamed('cnt', 't_cnt'), 'bucket', 'left')
        .crossJoin(F.broadcast(
            raw_dist.agg(F.sum('cnt').alias('r_tot'))
            .crossJoin(tgt_dist.agg(F.sum('cnt').alias('t_tot')))))
        .select(
            'bucket',
            (F.log((F.coalesce(F.col('t_cnt'), F.lit(0)) + 1).cast('double')
                   / (F.col('t_tot') + n_buckets).cast('double'))
             - F.log((F.coalesce(F.col('r_cnt'), F.lit(0)) + 1)
                     .cast('double')
                     / (F.col('r_tot') + n_buckets).cast('double')))
            .alias('w'))
    )
    return (per_doc.join(F.broadcast(w), 'bucket')
            .groupBy('doc_id')
            .agg(F.sum(F.col('n') * F.col('w')).alias('log_weight')))


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
