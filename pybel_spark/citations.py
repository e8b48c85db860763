"""Citation enrichment: resolve PubMed metadata (authors) onto edges.

Reference: ``manager/citation_utils.py:137-244`` (enrich_pubmed_citations —
batched EUtils lookups cached in SQLite, then written onto every edge's
citation dict) and ``struct/graph.py:316-325`` (number_of_authors /
count_authors).

Spark-first shape: the service call is per DISTINCT pmid, not per edge —
a corpus with 10⁹ edges typically has ~10⁷ distinct citations. The distinct
pmids flow through ONE Arrow-batched ``mapInPandas`` stage whose batches
become the resolver's request batches (the real-world HTTP batching
boundary), and the resulting small (pmid → authors) table is broadcast-
joined back onto the edges — the edge table itself is never shuffled.

The network fetch itself is out of scope in this environment (no HTTP), so
the default resolver is a deterministic fake with the exact signature a real
EUtils client would have: ``resolver(pmids: list[str]) -> dict[str,
list[str]]``.
"""
import hashlib

from pyspark.sql import DataFrame, functions as F

from .ops.graph import KG


def fake_pubmed_resolver(pmids):
    """Deterministic stand-in for an EUtils author lookup: each pmid gets
    1-4 md5-derived authors, reproducible in any engine."""
    out = {}
    for pmid in pmids:
        digest = hashlib.md5(str(pmid).encode('utf8')).hexdigest()
        n = int(digest[:2], 16) % 4 + 1
        out[str(pmid)] = [
            'Author {} {}'.format(digest[2 + 2 * i:4 + 2 * i], i)
            for i in range(n)
        ]
    return out


def resolve_citation_authors(edges: DataFrame, resolver=None) -> DataFrame:
    """(citation_id → authors) table for every distinct PubMed citation.

    One resolver call per Arrow batch of DISTINCT pmids — the batch size
    (spark.sql.execution.arrow.maxRecordsPerBatch) is the service-request
    batch size.
    """
    import pandas as pd

    if resolver is None:
        resolver = fake_pubmed_resolver

    pmids = (
        edges.where(F.col('citation_db') == 'PubMed')
        .select(F.col('citation_id')).distinct()
    )

    def lookup(batches):
        for pdf in batches:
            batch = list(pdf['citation_id'])
            resolved = resolver(batch)
            yield pd.DataFrame({
                'citation_id': batch,
                'authors': [resolved.get(str(p)) for p in batch],
            })

    return pmids.mapInPandas(
        lookup, schema='citation_id string, authors array<string>')


def enrich_pubmed_citations(edges: DataFrame, resolver=None) -> DataFrame:
    """Fill ``citation_authors`` on every PubMed edge
    (citation_utils.py:137-244). Broadcast join: the distinct-citation table
    is tiny next to the edge table, so the edges never shuffle."""
    authors = resolve_citation_authors(edges, resolver) \
        .withColumnRenamed('authors', '_resolved_authors')
    out_cols = edges.columns
    return (
        edges.join(F.broadcast(authors), on='citation_id', how='left')
        .withColumn(
            'citation_authors',
            F.when(F.col('citation_db') == 'PubMed',
                   F.coalesce('_resolved_authors', 'citation_authors'))
            .otherwise(F.col('citation_authors')))
        .select(*out_cols)
    )


def count_authors(edges: DataFrame) -> DataFrame:
    """Edge count per author (graph.py:count_authors Counter)."""
    return (
        edges.where(F.col('citation_authors').isNotNull())
        .select(F.explode('citation_authors').alias('author'))
        .groupBy('author').agg(F.count(F.lit(1)).alias('n_edges'))
        .orderBy('author')
    )


def number_of_authors(graph_or_edges) -> int:
    """Distinct author count (graph.py:316-325)."""
    edges = graph_or_edges.edges \
        if isinstance(graph_or_edges, KG) else graph_or_edges
    return (
        edges.where(F.col('citation_authors').isNotNull())
        .select(F.explode('citation_authors').alias('author'))
        .distinct().count()
    )
