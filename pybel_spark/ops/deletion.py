"""Deletion operations: remove edges/nodes by predicate, prune leaves.

Reference: struct/mutation/deletion/deletion.py:25-92, mutation/utils.py:20-39,
deletion/protein_rna_origins.py:17-75. All anti-joins / NOT-filters; degree
computations are a single groupBy over edge endpoints.
"""
from pyspark.sql import DataFrame, functions as F

from ..bel.constants import (
    ASSOCIATION, BIOPROCESS, CAUSAL_RELATIONS, GENE, PATHOLOGY, RNA,
    TRANSCRIBED_TO, TRANSLATED_TO,
)
from .graph import KG


def remove_filtered_edges(graph: KG, predicate) -> KG:
    """Drop edges matching the predicate; keep all nodes
    (deletion.py:remove_filtered_edges)."""
    return KG(graph.nodes, graph.edges.where(~predicate))


def remove_associations(graph: KG) -> KG:
    return remove_filtered_edges(graph, F.col('relation') == ASSOCIATION)


def remove_non_causal_edges(graph: KG) -> KG:
    return KG(graph.nodes,
              graph.edges.where(F.col('relation').isin(sorted(CAUSAL_RELATIONS))))


def remove_filtered_nodes(graph: KG, predicate) -> KG:
    """Drop nodes matching the predicate plus their incident edges."""
    nodes = graph.nodes.where(~predicate)
    keep = nodes.select('node_id')
    edges = (
        graph.edges
        .join(keep.withColumnRenamed('node_id', 'source_id'),
              on='source_id', how='leftsemi')
        .join(keep.withColumnRenamed('node_id', 'target_id'),
              on='target_id', how='leftsemi')
    )
    return KG(nodes, edges)


def remove_pathologies(graph: KG) -> KG:
    return remove_filtered_nodes(graph, F.col('function') == PATHOLOGY)


def remove_biological_processes(graph: KG) -> KG:
    return remove_filtered_nodes(graph, F.col('function') == BIOPROCESS)


def node_degrees(graph: KG) -> DataFrame:
    """(node_id, in_degree, out_degree, degree) over the edge multiset."""
    out_deg = graph.edges.groupBy(F.col('source_id').alias('node_id')) \
        .agg(F.count(F.lit(1)).alias('out_degree'))
    in_deg = graph.edges.groupBy(F.col('target_id').alias('node_id')) \
        .agg(F.count(F.lit(1)).alias('in_degree'))
    return (
        graph.nodes.select('node_id')
        .join(out_deg, on='node_id', how='left')
        .join(in_deg, on='node_id', how='left')
        .fillna(0, subset=['in_degree', 'out_degree'])
        .withColumn('degree', F.col('in_degree') + F.col('out_degree'))
    )


def remove_isolated_nodes(graph: KG) -> KG:
    """mutation/utils.py:remove_isolated_nodes."""
    connected = (
        graph.edges.select(F.col('source_id').alias('node_id'))
        .unionByName(graph.edges.select(F.col('target_id').alias('node_id')))
        .distinct()
    )
    return KG(graph.nodes.join(connected, on='node_id', how='leftsemi'),
              graph.edges)


def remove_isolated_list_abundances(graph: KG) -> KG:
    """List abundances whose only edges are their partOf member links
    (deletion.py:remove_isolated_list_abundances)."""
    non_structural = graph.edges.where(F.col('relation') != 'partOf')
    touched = (
        non_structural.select(F.col('source_id').alias('node_id'))
        .unionByName(non_structural.select(F.col('target_id').alias('node_id')))
        .distinct()
    )
    victims = (
        graph.nodes
        .where(F.col('n_members').isNotNull())
        .join(touched, on='node_id', how='leftanti')
        .select('node_id')
    )
    nodes = graph.nodes.join(victims, on='node_id', how='leftanti')
    keep = nodes.select('node_id')
    edges = (
        graph.edges
        .join(keep.withColumnRenamed('node_id', 'source_id'),
              on='source_id', how='leftsemi')
        .join(keep.withColumnRenamed('node_id', 'target_id'),
              on='target_id', how='leftsemi')
    )
    return KG(nodes, edges)


def prune_protein_rna_origins(graph: KG) -> KG:
    """Degree-1 leaf pruning of gene/RNA origin nodes whose only edge is the
    central-dogma link (deletion/protein_rna_origins.py:17-75)."""
    degrees = node_degrees(graph)
    leaves = degrees.where(F.col('degree') == 1).select('node_id')
    central = graph.edges.where(
        F.col('relation').isin([TRANSCRIBED_TO, TRANSLATED_TO]))
    origin_leaves = (
        graph.nodes
        .where(F.col('function').isin([GENE, RNA]))
        .join(leaves, on='node_id', how='leftsemi')
        .join(central.select(F.col('source_id').alias('node_id')),
              on='node_id', how='leftsemi')
        .select('node_id')
    )
    return _drop_nodes(graph, origin_leaves)


def _drop_nodes(graph: KG, victim_ids: DataFrame) -> KG:
    nodes = graph.nodes.join(victim_ids, on='node_id', how='leftanti')
    keep = nodes.select('node_id')
    edges = (
        graph.edges
        .join(keep.withColumnRenamed('node_id', 'source_id'),
              on='source_id', how='leftsemi')
        .join(keep.withColumnRenamed('node_id', 'target_id'),
              on='target_id', how='leftsemi')
    )
    return KG(nodes, edges)
