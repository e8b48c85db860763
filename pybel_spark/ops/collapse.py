"""Collapse operations: rewire edges from victim nodes onto survivors.

Reference: struct/mutation/collapse/collapse.py:22-101 and
collapse/protein_rna_origins.py:19-56. The classic entity-resolution join:
build a (victim → survivor) mapping DataFrame, left-join it onto both edge
endpoints, drop self-loops, dedup by content hash. The mapping side is small
relative to edges → broadcast it.
"""
from pyspark.sql import DataFrame, functions as F

from ..bel.constants import GENE, HAS_VARIANT, MIRNA, PROTEIN, RNA
from .graph import KG


def collapse_by_mapping(graph: KG, mapping: DataFrame) -> KG:
    """Rewire per a (victim_id, survivor_id) mapping (collapse.py:22-74).

    Edges touching a victim are re-pointed at its survivor; victim nodes are
    dropped; self-loops created by the rewrite are removed; duplicate edges
    collapse on the recomputed identity.
    """
    mapping = F.broadcast(
        mapping.select(
            F.col(mapping.columns[0]).alias('victim_id'),
            F.col(mapping.columns[1]).alias('survivor_id'),
        ).distinct())

    survivors = mapping.select(F.col('survivor_id').alias('node_id'),
                               F.col('victim_id'))

    edges = (
        graph.edges
        .join(mapping.withColumnRenamed('victim_id', 'source_id'),
              on='source_id', how='left')
        .withColumn('source_id', F.coalesce('survivor_id', 'source_id'))
        .drop('survivor_id')
        .join(mapping.withColumnRenamed('victim_id', 'target_id'),
              on='target_id', how='left')
        .withColumn('target_id', F.coalesce('survivor_id', 'target_id'))
        .drop('survivor_id')
        .where(F.col('source_id') != F.col('target_id'))
        .dropDuplicates(['source_id', 'target_id', 'relation', 'citation_db',
                         'citation_id', 'evidence', 'subject_modifier',
                         'object_modifier'])
    )
    # source/target bel strings become stale for rewired rows; refresh them
    # no forced broadcast: the node table is knowledge-sized but can
    # still exceed the driver at KG scale — let the size threshold / AQE
    # pick the strategy (code-review r4)
    node_bels = graph.nodes.select('node_id', 'node_bel')
    edges = (
        edges.drop('source_bel')
        .join(node_bels.withColumnRenamed('node_id', 'source_id')
              .withColumnRenamed('node_bel', 'source_bel'),
              on='source_id', how='left')
        .drop('target_bel')
        .join(node_bels.withColumnRenamed('node_id', 'target_id')
              .withColumnRenamed('node_bel', 'target_bel'),
              on='target_id', how='left')
    )
    nodes = graph.nodes.join(
        mapping.select(F.col('victim_id').alias('node_id')),
        on='node_id', how='leftanti')
    return KG(nodes, edges)


def variant_parent_mapping(graph: KG) -> DataFrame:
    """(variant node → parent reference node) from hasVariant edges."""
    return (
        graph.edges
        .where(F.col('relation') == HAS_VARIANT)
        .select(F.col('target_id').alias('victim_id'),
                F.col('source_id').alias('survivor_id'))
    )


def collapse_all_variants(graph: KG) -> KG:
    """Collapse every variant node onto its reference node
    (collapse.py:collapse_all_variants)."""
    return collapse_by_mapping(graph, variant_parent_mapping(graph))


def collapse_to_genes(graph: KG) -> KG:
    """Collapse proteins/RNAs/miRNAs onto their genes (collapse.py:77-101):
    first variants onto references, then central-dogma nodes onto the gene
    with the same concept."""
    collapsed = collapse_all_variants(graph)
    nodes = collapsed.nodes
    genes = nodes.where(F.col('function') == GENE).select(
        'namespace', 'name', F.col('node_id').alias('survivor_id'))
    rna_like = nodes.where(
        F.col('function').isin([RNA, MIRNA, PROTEIN])
        & F.col('namespace').isNotNull()
    ).select('namespace', 'name', F.col('node_id').alias('victim_id'))
    mapping = rna_like.join(F.broadcast(genes), on=['namespace', 'name']) \
        .select('victim_id', 'survivor_id')
    return collapse_by_mapping(collapsed, mapping)


def collapse_pair(graph: KG, survivor_id: str, victim_id: str) -> KG:
    """collapse.py:collapse_pair."""
    spark = graph.nodes.sparkSession
    mapping = spark.createDataFrame(
        [(victim_id, survivor_id)], ['victim_id', 'survivor_id'])
    return collapse_by_mapping(graph, mapping)
