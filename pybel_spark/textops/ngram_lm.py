"""N-gram language-model perplexity scoring — the CCNet-style "how far
is this page from a reference corpus" curation filter.

Everything is relational and deterministic, so the DuckDB oracle replays
it: TRAIN is an n-gram count aggregation over the reference slice;
SCORE is a join of the corpus's n-grams against the count tables with
Laplace (add-one) smoothing, then a per-document average log-prob:

    logp(w | ctx) = ln( (c(ctx, w) + 1) / (c(ctx) + V) )
    perplexity(doc) = exp( - mean over doc positions of logp )

Unseen words and unseen contexts fall out of the same formula via
coalesce(c, 0). Scale shape: the model is a TABLE (never collected /
broadcast-forced — reference corpora produce millions of n-grams), the
score join keys on (context, word) — fine-grained enough that a hot
context ('the …') spreads across its continuations, with AQE skew-join
as the backstop; the per-doc rollup is a uniform-key aggregation.
"""
from pyspark.sql import DataFrame, functions as F

from .tokenize import whitespace_tokens

#: sentence-start padding token (never collides with real lowercased text
#: because real tokens cannot contain '<')
BOS = '<s>'


def doc_ngrams(docs: DataFrame, n: int = 2, id_col='doc_id',
               text_col='text') -> DataFrame:
    """(doc_id, context, word) rows: lowercased whitespace tokens with
    (n-1) BOS pads, one row per position. Map-side only."""
    if n < 2:
        raise ValueError('n must be >= 2 (context + word)')
    toks = F.concat(
        F.array(*[F.lit(BOS)] * (n - 1)),
        F.transform(whitespace_tokens(text_col), lambda t: F.lower(t)))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.struct(
            F.concat_ws(' ', F.slice(toks, i + 1, n - 1)).alias('context'),
            F.element_at(toks, i + n).alias('word')))
    return (
        docs.select(F.col(id_col).alias('doc_id'), grams.alias('_g'))
        .select('doc_id', F.explode('_g').alias('g'))
        .select('doc_id', 'g.context', 'g.word')
    )


def train_ngram_lm(ref_docs: DataFrame, n: int = 2, id_col='doc_id',
                   text_col='text') -> DataFrame:
    """(context, word, c) counts over the REFERENCE corpus — the model is
    a DataFrame, written/read as parquet like any dimension table."""
    return (
        doc_ngrams(ref_docs, n, id_col, text_col)
        .groupBy('context', 'word')
        .agg(F.count(F.lit(1)).alias('c'))
    )


def lm_vocab_size(lm: DataFrame) -> int:
    """V = distinct reference words + 1 (the unseen-word mass)."""
    return lm.select('word').distinct().count() + 1


def score_perplexity(docs: DataFrame, lm: DataFrame, n: int = 2,
                     vocab_size: int = None, id_col='doc_id',
                     text_col='text') -> DataFrame:
    """(doc_id, n_scored, perplexity) — Laplace-smoothed per-document
    perplexity under the trained model, rounded to 6 decimals (keeps the
    ln/exp last-ulp noise out of cross-engine comparisons)."""
    if vocab_size is None:
        vocab_size = lm_vocab_size(lm)
    ctx_totals = lm.groupBy('context').agg(F.sum('c').alias('ctx_total'))
    grams = doc_ngrams(docs, n, id_col, text_col)
    scored = (
        grams
        .join(lm, on=['context', 'word'], how='left')
        .join(ctx_totals, on='context', how='left')
        .withColumn('logp', F.log(
            (F.coalesce('c', F.lit(0)) + F.lit(1)).cast('double')
            / (F.coalesce('ctx_total', F.lit(0)) + F.lit(vocab_size))))
    )
    return (
        scored.groupBy('doc_id')
        .agg(F.count(F.lit(1)).alias('n_scored'),
             F.round(F.exp(-F.avg('logp')), 6).alias('perplexity'))
    )


def filter_by_perplexity(docs: DataFrame, lm: DataFrame,
                         max_perplexity: float, n: int = 2,
                         vocab_size: int = None, id_col='doc_id',
                         text_col='text') -> DataFrame:
    """Keep documents whose perplexity under the reference model is at
    most ``max_perplexity`` (the CCNet head/middle cut)."""
    keep = (score_perplexity(docs, lm, n, vocab_size, id_col, text_col)
            .where(F.col('perplexity') <= max_perplexity)
            .select(F.col('doc_id').alias(id_col)))
    return docs.join(keep, on=id_col, how='leftsemi')


def source_divergence(docs: DataFrame, source_col='source',
                      text_col='text') -> DataFrame:
    """(source, n_tokens, kl_divergence) — Laplace-smoothed unigram KL
    of each source's token distribution against the whole corpus: the
    mixture-drift monitor (which sources look least like the blend).

    Exact smoothed KL needs every (source, vocab-word) pair: the vocab
    table (one row per distinct corpus word) joins against the
    source list — n_sources × |V| rows, fine for the dozens-of-sources
    mixture shape this monitors; the underlying counts are plain
    uniform-key aggregations."""
    words = docs.select(
        F.col(source_col).alias('source'),
        F.explode(F.transform(whitespace_tokens(text_col),
                              lambda t: F.lower(t))).alias('word'))
    counts_s = words.groupBy('source', 'word') \
        .agg(F.count(F.lit(1)).alias('c_s'))
    counts_g = words.groupBy('word').agg(F.count(F.lit(1)).alias('c_g'))
    totals_s = counts_s.groupBy('source').agg(F.sum('c_s').alias('n_s'))
    n_g = words.count()
    vocab_size = counts_g.count()

    full = (
        totals_s.crossJoin(counts_g)
        .join(counts_s, on=['source', 'word'], how='left')
        .withColumn('p', (F.coalesce('c_s', F.lit(0)) + 1).cast('double')
                    / (F.col('n_s') + vocab_size))
        .withColumn('q', (F.col('c_g') + 1).cast('double')
                    / F.lit(float(n_g + vocab_size)))
    )
    return (
        full.groupBy('source')
        .agg(F.first('n_s').alias('n_tokens'),
             F.round(F.sum(F.col('p') * F.log(F.col('p') / F.col('q'))), 6)
             .alias('kl_divergence'))
    )
