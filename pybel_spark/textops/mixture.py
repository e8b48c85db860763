"""Training-mixture construction ops: deterministic stratified sampling
and per-source token budgeting.

A 100-TB pretraining corpus is assembled by (a) sampling each source at a
target rate and (b) capping each source at a token budget, keeping the
best documents first. Both are expressed so the SAME arithmetic runs in
any md5-capable engine (the DuckDB oracles mirror them bit-exact):

- sampling is a pure map-side filter on an md5-derived uniform hash — no
  shuffle, no state, stable under reruns and late-arriving data;
- exact budgeting is a per-source cumulative-sum window (one shuffle on
  the source key);
- approximate budgeting replaces the per-source sort with a bucketized
  quality histogram (fully parallel partial aggregation, tiny driver
  cutoff table, then a map-side filter) — the shape that survives a
  single source holding 10^9 documents, where the exact window would
  funnel that source through one task.
"""
from pyspark.sql import DataFrame, Window, functions as F

from .tokenize import whitespace_tokens


def _token_count(col):
    return F.size(whitespace_tokens(col))

#: md5-prefix width used for sampling thresholds; 8 hex digits = 32 bits
#: of uniformity, plenty for per-mille sampling rates
_HEX_DIGITS = 8
_HEX_SPACE = 16 ** _HEX_DIGITS


def fraction_to_hex_threshold(fraction: float) -> str:
    """Sampling fraction → md5-prefix threshold, comparable as a string.

    A document is kept iff the first 8 hex chars of its sampling hash sort
    strictly below the threshold; lexicographic order on EQUAL-WIDTH hex
    equals numeric order on the 32-bit prefix, so the SQL mirror is a
    plain string comparison. fraction=1.0 maps to 'g', which sorts after
    every hex string in both engines (keep-all)."""
    fraction = min(max(fraction, 0.0), 1.0)
    value = int(round(fraction * _HEX_SPACE))
    if value >= _HEX_SPACE:
        return 'g'
    return format(value, '0{}x'.format(_HEX_DIGITS))


def sampling_hash(id_col='doc_id', seed: int = 0):
    """Uniform per-document hex hash: md5(seed ':' doc_id), first 8 chars."""
    return F.substring(
        F.md5(F.concat_ws(':', F.lit(str(seed)), F.col(id_col).cast('string'))),
        1, _HEX_DIGITS)


def stratified_sample(docs: DataFrame, fractions: dict,
                      default_fraction: float = 0.0, id_col='doc_id',
                      source_col='source', seed: int = 0) -> DataFrame:
    """Deterministic per-source subsample at the given rates.

    ``fractions`` maps source → target keep-rate; sources absent from the
    map keep ``default_fraction``. The decision for a document depends
    only on (seed, doc_id), so reruns, retries, and incremental batches
    make identical choices — the property that keeps a resumed 100-TB
    sampling job consistent. Plan shape: a single map-side filter fused
    into the scan; NO shuffle, NO aggregation.
    """
    thr = F.lit(fraction_to_hex_threshold(default_fraction))
    for source, fraction in sorted(fractions.items()):
        thr = F.when(F.col(source_col) == source,
                     F.lit(fraction_to_hex_threshold(fraction))).otherwise(thr)
    return docs.where(sampling_hash(id_col, seed) < thr)


def token_budget_select(docs: DataFrame, budget_per_source: int,
                        quality: DataFrame = None, id_col='doc_id',
                        source_col='source', text_col='text') -> DataFrame:
    """EXACT per-source token budgeting: keep the highest-quality documents
    of each source while the source's running token total stays within
    ``budget_per_source``.

    Order within a source is (quality_score desc, doc_id) — fully
    deterministic, ties broken by id. ``quality`` may supply a
    (doc_id, quality_score) table; by default it is computed with
    :func:`pybel_spark.textops.quality.quality_score`.

    Scale note: the cumulative-sum window hash-partitions on the source
    key, so ONE source's documents sort in ONE task. Fine up to
    ~10^7 docs/source; beyond that use :func:`token_budget_select_approx`,
    which needs no per-source sort at all.
    """
    from .quality import quality_score

    if quality is None:
        quality = quality_score(docs, id_col=id_col, text_col=text_col)
    scored = (
        docs.select(F.col(id_col).alias('doc_id'),
                    F.col(source_col).alias('source'),
                    _token_count(text_col).alias('n_tokens'))
        .join(quality, on='doc_id')
    )
    w = (Window.partitionBy('source')
         .orderBy(F.desc('quality_score'), F.asc('doc_id'))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        scored.withColumn('cum_tokens', F.sum('n_tokens').over(w))
        .where(F.col('cum_tokens') <= budget_per_source)
        .select('doc_id', 'source', 'n_tokens', 'quality_score',
                'cum_tokens')
    )


def token_budget_select_approx(docs: DataFrame, budget_per_source: int,
                               quality: DataFrame = None, id_col='doc_id',
                               source_col='source', text_col='text',
                               n_bins: int = 1000,
                               boundary_seed='budget-boundary') -> DataFrame:
    """Scale-path token budgeting: per-source QUALITY-HISTOGRAM cutoff
    instead of a per-source sort.

    1. bucketize quality into ``n_bins`` (map-side),
    2. aggregate token sums per (source, bin) — partial aggregation, at
       most ``n_sources × n_bins`` rows ever shuffle,
    3. driver-side: walk each source's histogram from the top bin down —
       full bins while they fit, then the BOUNDARY bin is taken
       partially via the deterministic md5-threshold sample at the
       leftover fraction (so a source whose top bin alone exceeds the
       budget still contributes, instead of keeping nothing),
    4. keep documents above the cutoff bin, or hash-sampled within it —
       a map-side filter against the broadcast cutoff table.

    The kept token mass is the budget in expectation; deviation is the
    binomial noise of the boundary-bin sample (±√(boundary docs)·avg
    tokens). No task ever holds more than a histogram. This is the
    formulation that survives a source with 10^9+ documents; use
    :func:`token_budget_select` when the budget must be a hard bound.

    ``boundary_seed`` salts the boundary-bin hash DISTINCTLY from the
    seed-0 hash used by ``stratified_sample`` / ``urls.cap_per_domain``:
    when those filters run upstream (sample → budget, the normal mixture
    pipeline), every survivor of a seed-0 threshold filter already has
    hash(0, doc) below that threshold — reusing the same hash here would
    make the boundary take perfectly correlated with the upstream keep
    decisions and overshoot the budget by up to the whole boundary bin
    (code-review r5). A distinct seed keeps the two md5 thresholds
    independent, restoring the documented binomial noise bound.
    """
    from .quality import quality_score

    if quality is None:
        quality = quality_score(docs, id_col=id_col, text_col=text_col)
    scored = (
        docs.select(F.col(id_col).alias('doc_id'),
                    F.col(source_col).alias('source'),
                    _token_count(text_col).alias('n_tokens'))
        .join(quality, on='doc_id')
        # NULL quality (e.g. empty text) must land in the LOWEST bin —
        # F.least() skips nulls, which would otherwise promote garbage
        # docs to the top bin (the exact path sorts them last: desc =
        # nulls last)
        .withColumn('bin', F.coalesce(
            F.least(F.floor(F.col('quality_score') * n_bins).cast('int'),
                    F.lit(n_bins - 1)),
            F.lit(0)))
    )
    hist = (scored.groupBy('source', 'bin')
            .agg(F.sum('n_tokens').alias('bin_tokens'))
            .collect())

    by_source = {}
    for row in hist:
        by_source.setdefault(row['source'], []).append(
            (row['bin'], row['bin_tokens']))
    cutoffs = []
    for source, bins in by_source.items():
        total = 0
        cutoff = n_bins  # exclusive lower edge of the fully-kept bins
        boundary_bin, boundary_thr = -1, fraction_to_hex_threshold(0.0)
        for b, tokens in sorted(bins, reverse=True):
            if total + tokens > budget_per_source:
                # partial take of the first bin that no longer fits
                leftover = budget_per_source - total
                boundary_bin = b
                boundary_thr = fraction_to_hex_threshold(
                    leftover / tokens if tokens else 0.0)
                break
            total += tokens
            cutoff = b
        cutoffs.append((source, cutoff, boundary_bin, boundary_thr))

    spark = docs.sparkSession
    cutoff_df = spark.createDataFrame(
        cutoffs,
        'source string, cutoff int, boundary_bin int, boundary_thr string')
    return (
        scored.join(F.broadcast(cutoff_df), on='source')
        .where((F.col('bin') >= F.col('cutoff'))
               | ((F.col('bin') == F.col('boundary_bin'))
                  & (sampling_hash('doc_id', boundary_seed)
                     < F.col('boundary_thr'))))
        .select('doc_id', 'source', 'n_tokens', 'quality_score')
    )


def assign_splits(docs: DataFrame, fractions=None, id_col='doc_id',
                  seed='split', key_col=None) -> DataFrame:
    """Deterministic train/val/test split assignment.

    ``fractions`` is an ordered mapping split-name → fraction (must sum to
    ~1; the LAST split absorbs rounding). A document's split depends only
    on (seed, doc_id) via the md5-prefix hash, so the split is stable
    across reruns, engines, and incremental batches — and independent of
    the seed-0 hash used by stratified_sample / cap_per_domain (the
    composed-filter correlation lesson from the r5 ADVICE).

    ``key_col`` hashes a different column than the id (e.g. a near-dup
    cluster representative, see :func:`leakage_safe_splits`).

    Plan shape: one map-side CASE fused into the scan; NO shuffle.
    """
    if fractions is None:
        fractions = {'train': 0.98, 'val': 0.01, 'test': 0.01}
    names = list(fractions)
    h = sampling_hash(key_col or id_col, seed)
    cum = 0.0
    expr = F.lit(names[-1])  # last split absorbs the tail
    # build the CASE from the last boundary backwards so earlier
    # thresholds take precedence
    bounds = []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, fraction_to_hex_threshold(cum)))
    for name, thr in reversed(bounds):
        expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    return docs.withColumn('split', expr)


def leakage_safe_splits(docs: DataFrame, clusters: DataFrame,
                        fractions=None, id_col='doc_id',
                        seed='split') -> DataFrame:
    """Train/val/test assignment with NO near-duplicate leakage across
    splits: the split hash is taken over the near-dup CLUSTER
    representative (``clusters`` = (doc_id, cluster_id), e.g.
    dedup.near_duplicate_clusters output), so every member of a cluster
    lands in the same split. Documents absent from ``clusters`` are their
    own singleton representative.

    Near-dup leakage is the classic eval-contamination failure: a test
    document whose near-copy sits in train. Hashing the representative
    closes it by construction.

    Plan: one equi-join on the doc id (broadcast when the paired-doc set
    is small relative to the corpus, AQE decides) + the same map-side
    CASE as assign_splits.
    """
    reps = clusters.select(F.col('doc_id').alias(id_col),
                           F.col('cluster_id').alias('_rep'))
    joined = docs.join(reps, on=id_col, how='left').withColumn(
        '_split_key',
        F.coalesce(F.col('_rep'), F.col(id_col)).cast('string'))
    return assign_splits(joined, fractions, id_col=id_col, seed=seed,
                         key_col='_split_key') \
        .drop('_rep', '_split_key')


def doremi_weights(docs: DataFrame, ref_docs: DataFrame, n_rounds: int = 5,
                   eta: float = 1.0, smoothing: float = 0.01,
                   n_buckets: int = 512, source_col='source',
                   text_col='text') -> DataFrame:
    """DoReMi-style domain mixture reweighting (Xie et al. 2023,
    arXiv:2305.10429): multiplicative-weights rounds that upweight
    domains with positive EXCESS loss — domains the current mixture
    models worse than the reference model does — yielding the (source,
    weight) table a pretraining sampler consumes.

    Documented simplification (no neural proxy training in a SQL-
    mirrorable engine): both models are add-one-smoothed hashed
    uni+bigram unigram models (the DSIR feature space, md5 buckets).
    The REFERENCE model is fit on ``ref_docs``; the round-t PROXY is the
    current mixture-weighted blend of per-domain distributions
    q_t(b) = Σ_d w_d·p_d(b). Per round:

        L_d(q)   = −Σ_b c_db·ln q(b) / N_d        (per-token loss)
        excess_d = max(0, L_d(q_t) − L_d(p_ref))
        w ∝ w·exp(η·excess);  w ← (1−s)·w + s/K    (uniform smoothing)

    Scale: ONE Arrow pass over each corpus folds the gram stream into a
    (K domains × n_buckets) count table (map-side, tiny exchange); the
    T-round update is driver-side numpy over that K×B matrix — no
    per-round corpus pass, unlike the neural original. Deterministic;
    the DuckDB oracle unrolls the same T rounds in SQL.
    """
    import numpy as np

    from .dsir import _doc_bucket_counts, bucket_distribution

    per_domain = (
        _doc_bucket_counts(docs, source_col, text_col, n_buckets,
                           combine_keys=True)
        .groupBy(F.col('doc_id').alias('source'), 'bucket')
        .agg(F.sum('n').alias('n'))
        .collect())
    sources = sorted({r['source'] for r in per_domain})
    k = len(sources)
    idx = {s: i for i, s in enumerate(sources)}
    c = np.zeros((k, n_buckets), dtype=np.int64)
    for r in per_domain:
        c[idx[r['source']], r['bucket']] = r['n']
    n_d = c.sum(axis=1)

    r_cnt = np.zeros(n_buckets, dtype=np.int64)
    for r in bucket_distribution(ref_docs, text_col=text_col,
                                 n_buckets=n_buckets).collect():
        r_cnt[r['bucket']] = r['cnt']
    p_ref = (r_cnt + 1.0) / float(int(r_cnt.sum()) + n_buckets)
    p_d = (c + 1.0) / (n_d + float(n_buckets))[:, None]

    l_ref = -(c * np.log(p_ref)).sum(axis=1) / n_d
    w = np.full(k, 1.0 / k)
    for _ in range(n_rounds):
        q = w @ p_d
        l_mix = -(c * np.log(q)).sum(axis=1) / n_d
        excess = np.maximum(l_mix - l_ref, 0.0)
        w = w * np.exp(eta * excess)
        w = w / w.sum()
        w = (1.0 - smoothing) * w + smoothing / k

    spark = docs.sparkSession
    return spark.createDataFrame(
        [(s, float(w[idx[s]])) for s in sources],
        'source string, weight double')
