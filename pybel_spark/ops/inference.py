"""Inference operations: enrich central-dogma origins, transfer causal edges.

Reference: struct/mutation/inference/protein_rna_origins.py:17-56
(enrich_proteins_with_rnas / enrich_rnas_with_genes) and
struct/mutation/transfer.py:15-78 (infer_child_relations). Parent derivation
is a column transform (protein concept → rna node is get_rna(),
node_classes.py:652-665); the central-dogma edges are generated rows.
"""
import json

from pyspark.sql import DataFrame, functions as F

from ..bel.constants import (
    GENE, IS_A, PROTEIN, RNA, TRANSCRIBED_TO, TRANSLATED_TO,
)
from ..bel import model
from .graph import KG


def _derived_node_rows(nodes: DataFrame, src_function, dst_function):
    """Build parent nodes of dst_function for reference (variant-free,
    fusion-free) nodes of src_function — a vectorized batch transform."""
    import pandas as pd

    from ..schemas import NODE_STRUCT

    candidates = nodes.where(
        (F.col('function') == src_function)
        & (F.col('variant_kinds').isNull())
        & (~F.col('has_fusion'))
        & F.col('namespace').isNotNull()
    ).select('node_id', 'namespace', 'name', 'identifier')

    from pyspark.sql.types import StringType, StructField, StructType
    # fresh StructType — StructType.add mutates in place, never touch the global
    out_schema = StructType(list(NODE_STRUCT.fields)
                            + [StructField('child_id', StringType())])

    def derive(batches):
        for pdf in batches:
            rows = []
            for child_id, namespace, name, identifier in zip(
                    pdf['node_id'], pdf['namespace'], pdf['name'], pdf['identifier']):
                node = model.make_simple(
                    dst_function, namespace,
                    None if name is None else name,
                    None if identifier is None else identifier)
                bel = model.node_as_bel(node)
                rows.append({
                    'node_id': model.node_md5(node),
                    'node_bel': bel,
                    'function': dst_function,
                    'namespace': namespace,
                    'name': name,
                    'identifier': identifier,
                    'variant_kinds': None,
                    'n_members': None,
                    'n_reactants': None,
                    'n_products': None,
                    'has_fusion': False,
                    'node_json': json.dumps(node, sort_keys=True,
                                            separators=(',', ':')),
                    'child_id': child_id,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return candidates.mapInPandas(derive, schema=out_schema)


def _unqualified_edge_rows(pairs: DataFrame, relation: str,
                           edges_template: DataFrame) -> DataFrame:
    """Build unqualified edge rows (source_id/bel, target_id/bel given in
    ``pairs``) with the engine's content-hash edge ids."""
    key = F.md5(F.to_json(F.struct(
        F.col('source_bel'), F.col('target_bel'), F.lit(relation))))
    generated = (
        pairs
        .withColumn('relation', F.lit(relation))
        .withColumn('edge_id', key)
        .withColumn('citation_db', F.lit(None).cast('string'))
        .withColumn('citation_id', F.lit(None).cast('string'))
        .withColumn('evidence', F.lit(None).cast('string'))
        .withColumn('annotations',
                    F.lit(None).cast('map<string,array<string>>'))
        .withColumn('subject_modifier', F.lit(None).cast('string'))
        .withColumn('object_modifier', F.lit(None).cast('string'))
        .withColumn('subject_modifier_kind', F.lit(None).cast('string'))
        .withColumn('object_modifier_kind', F.lit(None).cast('string'))
        .withColumn('line', F.lit(None).cast('int'))
        .withColumn('triple_subject', F.lit(None).cast('string'))
        .withColumn('triple_predicate', F.lit(None).cast('string'))
        .withColumn('triple_object', F.lit(None).cast('string'))
    )
    template_types = dict(edges_template.dtypes)
    for col in edges_template.columns:
        if col not in generated.columns:
            generated = generated.withColumn(
                col, F.lit(None).cast(template_types[col]))
    return generated.select(*edges_template.columns)


def _enrich(graph: KG, src_function, dst_function, relation,
            parent_is_source=True) -> KG:
    derived = _derived_node_rows(graph.nodes, src_function, dst_function)
    child_bels = graph.nodes.select(F.col('node_id').alias('child_id'),
                                    F.col('node_bel').alias('child_bel'))
    pairs_base = derived.join(child_bels, on='child_id')
    if parent_is_source:
        pairs = pairs_base.select(
            F.col('node_id').alias('source_id'),
            F.col('node_bel').alias('source_bel'),
            F.col('child_id').alias('target_id'),
            F.col('child_bel').alias('target_bel'))
    else:
        pairs = pairs_base.select(
            F.col('child_id').alias('source_id'),
            F.col('child_bel').alias('source_bel'),
            F.col('node_id').alias('target_id'),
            F.col('node_bel').alias('target_bel'))
    new_edges = _unqualified_edge_rows(pairs, relation, graph.edges)
    nodes = graph.nodes.unionByName(derived.drop('child_id')) \
        .dropDuplicates(['node_id'])
    edges = graph.edges.unionByName(new_edges).dropDuplicates(['edge_id'])
    return KG(nodes, edges)


def enrich_proteins_with_rnas(graph: KG) -> KG:
    """For each reference protein, add its RNA + (rna translatedTo protein)
    (inference/protein_rna_origins.py:36-56)."""
    return _enrich(graph, PROTEIN, RNA, TRANSLATED_TO, parent_is_source=True)


def enrich_rnas_with_genes(graph: KG) -> KG:
    """For each reference RNA, add its gene + (gene transcribedTo rna)."""
    return _enrich(graph, RNA, GENE, TRANSCRIBED_TO, parent_is_source=True)


def enrich_protein_and_rna_origins(graph: KG) -> KG:
    return enrich_rnas_with_genes(enrich_proteins_with_rnas(graph))


def transfer_causal_edges(graph: KG) -> KG:
    """Push causal edges from isA parents down to their children
    (mutation/transfer.py:15-78): for every (child isA parent) and causal
    edge (parent rel obj), add (child rel obj)."""
    from ..bel.constants import CAUSAL_RELATIONS

    is_a = graph.edges.where(F.col('relation') == IS_A).select(
        F.col('source_id').alias('child_id'),
        F.col('source_bel').alias('child_bel'),
        F.col('target_id').alias('parent_id'))
    causal = graph.edges.where(
        F.col('relation').isin(sorted(CAUSAL_RELATIONS)))
    inferred = (
        causal.withColumnRenamed('source_id', 'parent_id')
        .join(is_a, on='parent_id')
        .withColumn('source_id', F.col('child_id'))
        .withColumn('source_bel', F.col('child_bel'))
        .drop('parent_id', 'child_id', 'child_bel')
        .withColumn('edge_id', F.md5(F.to_json(F.struct(
            'source_bel', 'target_bel', 'relation', 'citation_db',
            'citation_id', 'evidence', 'subject_modifier', 'object_modifier'))))
        .select(*graph.edges.columns)
    )
    return KG(graph.nodes,
              graph.edges.unionByName(inferred).dropDuplicates(['edge_id']))
