"""Entity co-occurrence statistics with PPMI weighting.

The classic distributional-semantics association measure computed over the
compiled knowledge graph: two entities co-occur when they both appear (as a
source or target of any edge) in the same document.  PMI contrasts the joint
document frequency against the independence expectation,

    pmi(a, b)  = ln( df(a, b) * N / (df(a) * df(b)) )
    ppmi(a, b) = max(pmi(a, b), 0)

where ``N`` is the number of documents contributing at least one entity.
The reference exposes per-document edge provenance (pybel's
``BELGraph.edges[...]['citation']`` / annotation machinery) from which such
association tables are conventionally derived downstream; here the
computation is a first-class distributed operator.

Scale notes (100 TB shape):
- The per-document entity set is built map-side from the already-parsed
  per-document edge arrays; one ``distinct`` exchange of short
  ``(doc, entity)`` string pairs.
- The pair generation is a self-equi-join on the document key.  Its output
  is quadratic in the per-document entity count, so ``max_per_doc`` caps the
  fan-out: documents with pathologically many distinct entities (navigation
  boilerplate, index pages) are dropped, bounding every join group at
  ``cap**2`` rows.  This is the standard hot-document guard — the same
  shape as the hot-shingle df cap in textops.dedup.
- ``N`` rides along as a 1-row broadcast cross join (no driver collect),
  the same pattern as the PageRank dangling-mass term.
- The df re-attachment joins are plain equi-joins on the entity key; AQE
  broadcasts the df side when small.
"""

from pyspark.sql import DataFrame, functions as F

__all__ = ['doc_entity_sets', 'entity_cooccurrence_ppmi']


def citation_entity_sets(parsed: DataFrame) -> DataFrame:
    """Distinct (citation, entity) pairs — the co-CITATION context.

    Returns the same (doc, entity) shape as :func:`doc_entity_sets` with
    ``doc`` holding the citation key ``coalesce(db,'') || ':' || id``, so
    :func:`entity_cooccurrence_ppmi` runs unchanged: co-citation analysis
    IS co-occurrence with the citation as the context window (Small 1973).
    Unqualified edges (no citation) contribute nothing.
    """
    exploded = parsed.select(F.explode('edges').alias('e')) \
        .where(F.col('e.citation_id').isNotNull())
    key = F.concat(F.coalesce(F.col('e.citation_db'), F.lit('')),
                   F.lit(':'), F.col('e.citation_id'))
    return (
        exploded.select(key.alias('doc'),
                        F.col('e.source_bel').alias('entity'))
        .unionByName(
            exploded.select(key.alias('doc'),
                            F.col('e.target_bel').alias('entity')))
        .where(F.col('entity').isNotNull())
        .distinct()
    )


def doc_entity_sets(parsed: DataFrame, doc_col: str = 'url') -> DataFrame:
    """Distinct (doc, entity) pairs from the per-document edge arrays.

    ``parsed`` is the pre-explode compile result (one row per document with
    an ``edges`` array column) — NOT the globally deduped edge table, whose
    first-writer-wins dedup keeps only one provenance document per edge and
    would undercount document frequencies.
    """
    exploded = (
        parsed
        .select(F.col(doc_col).alias('doc'), F.explode('edges').alias('e'))
    )
    return (
        exploded.select('doc', F.col('e.source_bel').alias('entity'))
        .unionByName(
            exploded.select('doc', F.col('e.target_bel').alias('entity')))
        .where(F.col('entity').isNotNull())
        .distinct()
    )


def entity_cooccurrence_ppmi(doc_entities: DataFrame,
                             max_per_doc: int | None = None,
                             min_pair_docs: int = 1) -> DataFrame:
    """PPMI-weighted co-occurrence pairs over (doc, entity) rows.

    Returns one row per unordered entity pair (``entity_a < entity_b``) that
    shares at least ``min_pair_docs`` documents, with columns
    ``(entity_a, entity_b, n_pair, df_a, df_b, pmi, ppmi)``.

    ``max_per_doc`` drops documents whose distinct-entity count exceeds the
    cap BEFORE the self-join (and before df/N are counted, so the statistics
    stay consistent over the retained corpus).
    """
    ents = doc_entities.select('doc', 'entity').distinct()
    if max_per_doc is not None:
        per_doc = ents.groupBy('doc').agg(F.count(F.lit(1)).alias('_n'))
        keep = per_doc.where(F.col('_n') <= max_per_doc).select('doc')
        ents = ents.join(keep, 'doc')
    # materialize: five consumers (df, N, both self-join sides, via the
    # cap also per_doc) hang off this table and Spark does not reuse the
    # distinct exchange across them (0 ReusedExchange measured; the
    # upstream parse subtree was embedded 5x in the physical plan) —
    # one eager localCheckpoint collapses that to a single computation
    ents = ents.localCheckpoint(eager=True)

    df = ents.groupBy('entity').agg(F.count(F.lit(1)).alias('df'))
    n_docs = ents.select(
        F.countDistinct('doc').alias('n_docs'))  # 1-row broadcast term

    left = ents.select('doc', F.col('entity').alias('entity_a'))
    right = ents.select('doc', F.col('entity').alias('entity_b'))
    pairs = (
        left.join(right, 'doc')
        .where(F.col('entity_a') < F.col('entity_b'))
        .groupBy('entity_a', 'entity_b')
        .agg(F.count(F.lit(1)).alias('n_pair'))
        .where(F.col('n_pair') >= min_pair_docs)
    )

    # pmi is computed with the exact association order (bigint products,
    # one double division, one ln) so the DuckDB oracle mirror is
    # bit-identical — same contract as textops.ngram_lm's ln/exp oracle.
    joined = (
        pairs
        .join(df.select(F.col('entity').alias('entity_a'),
                        F.col('df').alias('df_a')), 'entity_a')
        .join(df.select(F.col('entity').alias('entity_b'),
                        F.col('df').alias('df_b')), 'entity_b')
        .crossJoin(F.broadcast(n_docs))
    )
    pmi = F.log((F.col('n_pair') * F.col('n_docs'))
                / (F.col('df_a') * F.col('df_b')))
    return joined.select(
        'entity_a', 'entity_b', 'n_pair', 'df_a', 'df_b',
        pmi.alias('pmi'),
        F.greatest(pmi, F.lit(0.0)).alias('ppmi'),
    )
