"""Node and edge predicates as Column expressions.

Reference: struct/filters/node_predicates.py:45-269 (22 node predicates),
edge_predicates.py:40-177 (15 edge predicates), and the predicate builders.
Combinators are plain boolean Column algebra — Catalyst folds and pushes them
into the scan.
"""
from pyspark.sql import Column, DataFrame, functions as F

from ..bel.constants import (
    ABUNDANCE, ACTIVITY, ASSOCIATION, BIOPROCESS, CAUSAL_POLAR_RELATIONS,
    CAUSAL_RELATIONS, CELL_SECRETION, CELL_SURFACE_EXPRESSION,
    CORRELATIVE_RELATIONS, DEGRADATION, DIRECT_CAUSAL_RELATIONS, FRAGMENT,
    GENE, GMOD, HGVS, MIRNA, PATHOLOGY, PMOD, PROTEIN, RNA, TRANSLOCATION,
)

# ----------------------------- node predicates ----------------------------- #

def function_inclusion(*functions) -> Column:
    """node_predicate_builders.function_inclusion_filter_builder."""
    return F.col('function').isin(list(functions))


# NOTE: predicates are factory functions (not module-level Column constants)
# because building a Column requires an active SparkContext in PySpark 4.

def is_abundance():
    return function_inclusion(ABUNDANCE)


def is_gene():
    return function_inclusion(GENE)


def is_protein():
    return function_inclusion(PROTEIN)


def is_pathology():
    return function_inclusion(PATHOLOGY)


def is_biological_process():
    return function_inclusion(BIOPROCESS)


def not_pathology():
    return ~is_pathology()


def is_central_dogma():
    return function_inclusion(GENE, RNA, MIRNA, PROTEIN)


def namespace_inclusion(*namespaces) -> Column:
    return F.col('namespace').isin(list(namespaces))


def has_variant() -> Column:
    return F.col('variant_kinds').isNotNull() & (F.size('variant_kinds') > 0)


def _has_variant_kind(kind) -> Column:
    return F.col('variant_kinds').isNotNull() \
        & F.array_contains('variant_kinds', kind)


def has_protein_modification() -> Column:
    return _has_variant_kind(PMOD)


def has_gene_modification() -> Column:
    return _has_variant_kind(GMOD)


def has_hgvs() -> Column:
    return _has_variant_kind(HGVS)


def has_fragment() -> Column:
    return _has_variant_kind(FRAGMENT)


def is_list_abundance() -> Column:
    return F.col('n_members').isNotNull()


def is_reaction() -> Column:
    return F.col('n_reactants').isNotNull()


def has_fusion() -> Column:
    return F.col('has_fusion')


def name_search(substring) -> Column:
    """node_predicate_builders name-search (case-insensitive contains)."""
    return F.lower(F.col('name')).contains(substring.lower())


def filter_nodes(nodes: DataFrame, predicate: Column) -> DataFrame:
    return nodes.where(predicate)


def count_passed_node_filter(nodes: DataFrame, predicate: Column) -> int:
    return nodes.where(predicate).count()


# ----------------------------- edge predicates ----------------------------- #

def relation_inclusion(*relations) -> Column:
    return F.col('relation').isin(list(relations))


def is_causal_relation():
    return relation_inclusion(*sorted(CAUSAL_RELATIONS))


def is_direct_causal_relation():
    return relation_inclusion(*sorted(DIRECT_CAUSAL_RELATIONS))


def is_associative_relation():
    return relation_inclusion(ASSOCIATION)


def has_polarity():
    return relation_inclusion(*sorted(
        CAUSAL_POLAR_RELATIONS
        | (CORRELATIVE_RELATIONS - {'correlation', 'noCorrelation'})))


def is_correlative_relation():
    return relation_inclusion(*sorted(CORRELATIVE_RELATIONS))


def has_provenance() -> Column:
    """edge_predicates.has_provenance: both citation and evidence present."""
    return F.col('citation_db').isNotNull() & F.col('evidence').isNotNull()


def has_pubmed() -> Column:
    return F.col('citation_db') == 'PubMed'


def edge_has_activity() -> Column:
    return (F.col('subject_modifier_kind') == ACTIVITY) \
        | (F.col('object_modifier_kind') == ACTIVITY)


def edge_has_degradation() -> Column:
    return (F.col('subject_modifier_kind') == DEGRADATION) \
        | (F.col('object_modifier_kind') == DEGRADATION)


def edge_has_translocation() -> Column:
    tloc = [TRANSLOCATION, CELL_SECRETION, CELL_SURFACE_EXPRESSION]
    return F.col('subject_modifier_kind').isin(tloc) \
        | F.col('object_modifier_kind').isin(tloc)


def edge_has_annotation(key) -> Column:
    return F.map_contains_key(F.col('annotations'), F.lit(key))


def annotation_value_match(key, *values) -> Column:
    """edge_predicate_builders.build_annotation_dict_any_filter."""
    return F.arrays_overlap(
        F.coalesce(F.col('annotations').getItem(key), F.array()),
        F.array(*[F.lit(v) for v in values]),
    )


def pmid_inclusion(*pmids) -> Column:
    return has_pubmed() & F.col('citation_id').isin(list(pmids))


def has_authors() -> Column:
    """edge_predicates.has_authors: enriched citation with ≥1 author."""
    return F.col('citation_authors').isNotNull() \
        & (F.size('citation_authors') > 0)


def author_inclusion(*authors) -> Column:
    """edge_predicate_builders.build_author_inclusion_filter: any of the
    given authors appears in the edge's citation."""
    return has_authors() & F.arrays_overlap(
        F.col('citation_authors'),
        F.array(*[F.lit(a) for a in authors]))


def filter_edges(edges: DataFrame, predicate: Column) -> DataFrame:
    return edges.where(predicate)


# --------------------- degree-based node predicates --------------------- #
# Reference node_predicates.py:192-269: these depend on a node's incident
# edges, so they are id-set builders (one distinct-projection of the causal
# edge set each) rather than Column expressions; apply with
# ``select_nodes_by_ids`` / ``exclude_nodes_by_ids`` (semi-/anti-join).

def _causal_edges(graph):
    return graph.edges.where(
        F.col('relation').isin(sorted(CAUSAL_RELATIONS)))


def has_causal_in_edges_ids(graph) -> DataFrame:
    """node_ids with ≥1 incoming causal edge (node_predicates.py:192-198)."""
    return _causal_edges(graph) \
        .select(F.col('target_id').alias('node_id')).distinct()


def has_causal_out_edges_ids(graph) -> DataFrame:
    """node_ids with ≥1 outgoing causal edge (node_predicates.py:201-207)."""
    return _causal_edges(graph) \
        .select(F.col('source_id').alias('node_id')).distinct()


def is_causal_source_ids(graph) -> DataFrame:
    """causal out-edges but NO causal in-edges (node_predicates.py:233-241)."""
    return has_causal_out_edges_ids(graph) \
        .exceptAll(has_causal_in_edges_ids(graph)).distinct()


def is_causal_sink_ids(graph) -> DataFrame:
    """causal in-edges but NO causal out-edges (node_predicates.py:244-251)."""
    return has_causal_in_edges_ids(graph) \
        .exceptAll(has_causal_out_edges_ids(graph)).distinct()


def is_causal_central_ids(graph) -> DataFrame:
    """both causal in- and out-edges (node_predicates.py:254-260)."""
    return has_causal_in_edges_ids(graph) \
        .intersect(has_causal_out_edges_ids(graph))


def select_nodes_by_ids(nodes: DataFrame, ids: DataFrame) -> DataFrame:
    """node_inclusion_predicate_builder as a semi-join."""
    return nodes.join(ids.select('node_id'), on='node_id', how='leftsemi')


def exclude_nodes_by_ids(nodes: DataFrame, ids: DataFrame) -> DataFrame:
    """node_exclusion_predicate_builder as an anti-join."""
    return nodes.join(ids.select('node_id'), on='node_id', how='leftanti')
