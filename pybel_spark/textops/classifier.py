"""Learned quality filtering: a linear classifier over the engine's
quality/repetition features (the fastText-style "looks like a reference
corpus vs looks like raw crawl" filter real curation pipelines train).

Heuristic gates (quality.quality_score) are the bootstrap; this module
is the next rung: label a seed set (e.g. curated corpus = positive,
random crawl = negative), train logistic regression ON THE CLUSTER
(pyspark.ml — training data never leaves executors), then score the
full corpus with the model broadcast into one map-side projection.

The FEATURES are the already-oracle-checked deterministic columns
(quality_features + repetition_features), so scoring is reproducible;
training itself is iterative/approximate and therefore pytest-verified
(separability, ranking sanity) rather than SQL-oracle-checked.
"""
from pyspark.sql import DataFrame, functions as F

FEATURE_COLS = ('n_chars_computed', 'n_tokens', 'mean_token_len',
                'stopword_ratio', 'alpha_ratio', 'dup_token_ratio',
                'top_bigram_ratio')


def feature_table(docs: DataFrame, id_col='doc_id',
                  text_col='text') -> DataFrame:
    """One row per document with the full feature vector's columns —
    quality + repetition signals in one pass-join on the id column."""
    from .quality import quality_features, repetition_features

    joined = (
        quality_features(docs, id_col, text_col)
        .join(repetition_features(docs, id_col, text_col), on='doc_id')
    )
    # normalize every feature to non-null double: fillna(0.0) silently
    # skips integer columns (n_tokens, n_chars_computed), which would
    # reach VectorAssembler as NULL for null-text docs and crash scoring
    return joined.select(
        'doc_id',
        *[F.coalesce(F.col(c).cast('double'), F.lit(0.0)).alias(c)
          for c in FEATURE_COLS])


def train_quality_classifier(docs: DataFrame, labels: DataFrame,
                             id_col='doc_id', text_col='text',
                             label_col='label', max_iter: int = 50,
                             reg_param: float = 0.0):
    """Fit logistic regression on (doc_id, label∈{0,1}) seed labels.

    Returns the fitted pyspark.ml PipelineModel (assembler + scaler +
    LR). Training shuffles only the labeled subset — the corpus at large
    is never touched until scoring."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = feature_table(docs, id_col, text_col)
    train = feats.join(
        labels.select(F.col(id_col).alias('doc_id'),
                      F.col(label_col).cast('double').alias('label')),
        on='doc_id')
    pipeline = Pipeline(stages=[
        VectorAssembler(inputCols=list(FEATURE_COLS),
                        outputCol='_features_raw'),
        StandardScaler(inputCol='_features_raw', outputCol='_features',
                       withMean=True, withStd=True),
        LogisticRegression(featuresCol='_features', labelCol='label',
                           maxIter=max_iter, regParam=reg_param),
    ])
    return pipeline.fit(train)


def score_quality(docs: DataFrame, model, id_col='doc_id',
                  text_col='text') -> DataFrame:
    """(doc_id, quality_prob) for every document: P(label=1) from the
    fitted model. The model is a small broadcast; scoring is one
    map-side projection over the feature columns — no shuffle beyond the
    feature join."""
    from pyspark.ml.functions import vector_to_array

    feats = feature_table(docs, id_col, text_col)
    scored = model.transform(feats)
    return scored.select(
        'doc_id',
        vector_to_array('probability')[1].alias('quality_prob'))


def filter_by_model(docs: DataFrame, model, threshold: float = 0.5,
                    id_col='doc_id', text_col='text') -> DataFrame:
    """Keep documents the model scores above ``threshold`` — the learned
    replacement for quality.quality_score's fixed gate."""
    keep = score_quality(docs, model, id_col, text_col) \
        .where(F.col('quality_prob') >= threshold) \
        .select(F.col('doc_id').alias(id_col))
    return docs.join(keep, on=id_col, how='leftsemi')
