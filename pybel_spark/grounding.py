"""Join-based entity grounding — the scale path for namespace dictionaries
too large to broadcast.

The pipeline's default grounding is a per-executor broadcast dict probe
inside the parse UDF (pipeline.make_parse_func) — right for HGNC/GO/CHEBI
at tens of MB. When the combined dictionaries outgrow executor memory
(cross-species, full synonym tables), grounding becomes a DataFrame join:

1. explode every concept mention out of the node table
   (ops.summary.iter_node_concepts — recursing into variants, fusions,
   members, reactions);
2. **salted shuffle join** — the join key is (namespace, name), so
   namespace-level skew is already spread across names; the residual hot
   key is a single ubiquitous MENTION (one protein cited in 10^9 pages).
   With ``salt_buckets`` the mention side gains a row-hash salt column
   and the (small) terms side is exploded across the salt domain, so the
   join key becomes (namespace, name, salt) and even one mega-mention
   spreads over ``salt_buckets`` reducers (the north-star's salted-hash
   skew defusal, applied where it actually binds), with AQE skew-join as
   the runtime backstop;
3. equi-join on (namespace, case-sensitive name — matching the reference
   grammar's dict probe) against the terms table — broadcast when it
   fits, shuffle otherwise.

Reference: the lookups in parser/parse_concept.py + the namespace manager
(manager/), re-expressed as relational joins.
"""
from pyspark.sql import DataFrame, functions as F

from .ops.summary import iter_node_concepts


def namespace_terms_table(spark, catalog, namespace_urls) -> DataFrame:
    """(namespace_keyword, name, encoding) rows from .belns resources —
    the dictionary side of the grounding join. At real scale this table
    is a parquet/Iceberg dimension maintained out-of-band."""
    rows = []
    for keyword, url in sorted(namespace_urls.items()):
        for name, encoding in catalog.namespace(url).items():
            rows.append((keyword, name, encoding))
    return spark.createDataFrame(
        rows, 'namespace string, name string, encoding string')


def ground_concepts_join(nodes: DataFrame, terms: DataFrame,
                         broadcast_terms=True,
                         salt_buckets=None) -> DataFrame:
    """Ground every concept mention via a relational join.

    Output: (node_id, namespace, name, identifier, encoding, is_grounded).
    ``broadcast_terms=False`` + ``salt_buckets`` is the
    larger-than-memory-dictionary path: shuffle join with the mention side
    salted so hot namespaces cannot pin a reducer.
    """
    return ground_mentions_join(iter_node_concepts(nodes), terms,
                                broadcast_terms=broadcast_terms,
                                salt_buckets=salt_buckets)


def ground_mentions_join(concepts: DataFrame, terms: DataFrame,
                         broadcast_terms=True,
                         salt_buckets=None) -> DataFrame:
    """The grounding join itself over an already-extracted mention table
    (node_id, namespace, name) — the unit the oracle gate covers directly
    with a synthetic hot-key-skewed mention stream."""
    terms_side = terms.withColumnRenamed('name', '_term_name') \
        .withColumnRenamed('namespace', '_term_ns')
    join_cond = [concepts['namespace'] == F.col('_term_ns'),
                 concepts['name'] == F.col('_term_name')]
    if broadcast_terms:
        terms_side = F.broadcast(terms_side)
    elif salt_buckets:
        # genuine hot-KEY salting: a bare repartition before the join is
        # discarded by the join's own exchange (code-review r4) — instead
        # the salt joins as part of the key: mentions get a row-hash
        # salt, the dictionary side is exploded across the salt domain
        concepts = concepts.withColumn(
            '_salt', F.pmod(F.xxhash64(F.col('node_id')),
                            F.lit(salt_buckets)).cast('int'))
        terms_side = terms_side.withColumn(
            '_salt',
            F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
        join_cond = join_cond + [concepts['_salt'] == terms_side['_salt']]
    joined = concepts.join(terms_side, on=join_cond, how='left')
    return joined.select(
        'node_id', 'namespace', 'name', 'identifier', 'encoding',
        F.col('encoding').isNotNull().alias('is_grounded'))


def grounding_report(nodes: DataFrame, terms: DataFrame, **kwargs) -> DataFrame:
    """Per-namespace hit/miss counts — the dataset-quality view a curator
    reads after a run."""
    grounded = ground_concepts_join(nodes, terms, **kwargs)
    return (
        grounded.groupBy('namespace')
        .agg(F.count(F.lit(1)).alias('n_mentions'),
             F.sum(F.col('is_grounded').cast('long')).alias('n_grounded'))
        .withColumn('hit_rate',
                    F.col('n_grounded') / F.col('n_mentions'))
        .orderBy('namespace')
    )
