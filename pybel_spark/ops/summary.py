"""Summary / aggregation operations.

Reference: struct/summary/node_summary.py:41-238, edge_summary.py:29-170,
errors.py:24-98, provenance.py:16-33 and graph.py:770-796. All plain
groupBy/agg/top-k — Catalyst handles partial aggregation map-side.
"""
from pyspark.sql import DataFrame, functions as F

from ..bel.constants import PATHOLOGY
from .deletion import node_degrees
from .graph import KG


def count_functions(graph: KG) -> DataFrame:
    """node count by function (node_summary.py:41-57)."""
    return graph.nodes.groupBy('function') \
        .agg(F.count(F.lit(1)).alias('n_nodes')).orderBy('function')


def count_namespaces(graph: KG) -> DataFrame:
    """node count by namespace (node_summary.py:59-93)."""
    return graph.nodes.where(F.col('namespace').isNotNull()) \
        .groupBy('namespace').agg(F.count(F.lit(1)).alias('n_nodes')) \
        .orderBy('namespace')


def get_names_by_namespace(graph: KG, namespace) -> DataFrame:
    return graph.nodes.where(F.col('namespace') == namespace) \
        .select('name').distinct().orderBy('name')


def count_variants(graph: KG) -> DataFrame:
    """variant-kind histogram (node_summary.py:196-206)."""
    return (
        graph.nodes
        .where(F.col('variant_kinds').isNotNull())
        .select(F.explode('variant_kinds').alias('kind'))
        .groupBy('kind').agg(F.count(F.lit(1)).alias('n_nodes'))
        .orderBy('kind')
    )


def get_top_hubs(graph: KG, n=15) -> DataFrame:
    """top-k by total degree over the edge multiset (node_summary.py:209-215)."""
    return (
        node_degrees(graph)
        .join(graph.nodes.select('node_id', 'node_bel'), on='node_id')
        .orderBy(F.desc('degree'), 'node_bel')
        .limit(n)
        .select('node_bel', 'degree')
    )


def get_top_pathologies(graph: KG, n=15) -> DataFrame:
    """pathology mention count (node_summary.py:218-238)."""
    path_ids = graph.nodes.where(F.col('function') == PATHOLOGY) \
        .select('node_id', 'node_bel')
    return (
        node_degrees(graph)
        .join(path_ids, on='node_id')
        .orderBy(F.desc('degree'), 'node_bel')
        .limit(n)
        .select('node_bel', 'degree')
    )


def count_relations(graph: KG) -> DataFrame:
    """edge count by relation (edge_summary.py:88-97)."""
    return graph.edges.groupBy('relation') \
        .agg(F.count(F.lit(1)).alias('n_edges')).orderBy('relation')


def count_annotations(graph: KG) -> DataFrame:
    """distinct annotation keys in use (edge_summary.py:29-152)."""
    return (
        graph.edges
        .where(F.col('annotations').isNotNull())
        .select(F.explode(F.map_keys('annotations')).alias('annotation'))
        .groupBy('annotation').agg(F.count(F.lit(1)).alias('n_edges'))
        .orderBy('annotation')
    )


def get_annotation_values(graph: KG, key) -> DataFrame:
    return (
        graph.edges
        .where(F.col('annotations').isNotNull())
        .select(F.explode(F.coalesce(F.col('annotations').getItem(key),
                                     F.array())).alias('value'))
        .distinct().orderBy('value')
    )


def iter_annotation_value_pairs(graph: KG) -> DataFrame:
    """(annotation, value) pairs in use (edge_summary.py:29-45)."""
    return (
        graph.edges
        .where(F.col('annotations').isNotNull())
        .select(F.explode('annotations').alias('annotation', 'values'))
        .select('annotation', F.explode('values').alias('value'))
        .distinct().orderBy('annotation', 'value')
    )


def get_pubmed_identifiers(graph: KG) -> DataFrame:
    """distinct PMIDs (provenance.py:16-33)."""
    return (
        graph.edges
        .where(F.col('citation_db') == 'PubMed')
        .select(F.col('citation_id').alias('pmid'))
        .distinct().orderBy('pmid')
    )


def count_citations(graph: KG) -> int:
    """graph.py:number_of_citations."""
    return graph.edges.where(F.col('citation_db').isNotNull()) \
        .select('citation_db', 'citation_id').distinct().count()


def count_error_types(warnings: DataFrame) -> DataFrame:
    """warnings analytics (errors.py:24-40)."""
    return warnings.groupBy('error_class') \
        .agg(F.count(F.lit(1)).alias('n_warnings')).orderBy('error_class')


def graph_summary(graph: KG, warnings: DataFrame = None) -> dict:
    """graph.py:770-796 summarize.
    Density = E / (V * (V - 1)) for a directed multigraph's simple projection."""
    n = graph.nodes.count()
    m = graph.edges.count()
    out = {
        'nodes': n,
        'edges': m,
        'density': (m / (n * (n - 1))) if n > 1 else 0.0,
        'citations': count_citations(graph),
    }
    if warnings is not None:
        out['warnings'] = warnings.count()
    return out
