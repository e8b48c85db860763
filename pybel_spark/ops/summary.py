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


def _json_child_nodes(js):
    """All direct child node-JSON strings of one node-JSON column: list
    members, reaction participants, fusion partners. ``from_json`` to
    array<string> keeps each element as its RAW JSON text, so the
    recursion state stays a plain string column — no Python."""
    lists = [
        F.coalesce(
            F.from_json(F.get_json_object(js, '$.' + key), 'array<string>'),
            F.array())
        for key in ('members', 'reactants', 'products')
    ]
    fusion = F.array_compact(F.array(
        F.get_json_object(js, '$.fusion.partner_5p'),
        F.get_json_object(js, '$.fusion.partner_3p')))
    return F.concat(*lists, fusion)


def _level_concepts(level: DataFrame) -> DataFrame:
    """Concepts mentioned directly by one frontier level: the node's own
    concept plus its variants' concepts (variants are leaves — the
    reference walk reads their concept but never recurses into them)."""
    def pick(js):
        return [
            F.get_json_object(js, '$.concept.namespace').alias('namespace'),
            F.get_json_object(js, '$.concept.name').alias('name'),
            F.get_json_object(js, '$.concept.identifier').alias('identifier'),
        ]

    own = level.select('node_id', *pick(F.col('js')))
    variants = (
        level.select(
            'node_id',
            F.explode(F.coalesce(
                F.from_json(F.get_json_object('js', '$.variants'),
                            'array<string>'),
                F.array())).alias('vjs'))
        .select('node_id', *pick(F.col('vjs')))
    )
    return (
        own.unionByName(variants)
        # reference truthiness check: missing OR empty namespace -> skip
        .where(F.col('namespace').isNotNull() & (F.col('namespace') != ''))
    )


def iter_node_concepts(nodes: DataFrame, max_depth: int = 8) -> DataFrame:
    """Explode EVERY concept mentioned by each node — including variant
    concepts, fusion partners, list members, and reaction participants
    (reference node_summary.py:95-194 recursion).

    Pure column algebra: the recursion is unrolled as a linear chain of
    explode levels over raw-JSON string columns (get_json_object +
    from_json array<string>), so the whole extraction stays in
    whole-stage codegen — no MapInPandas stage (pinned by
    tests/test_plans.py). ``max_depth`` bounds the unroll; BEL nesting
    beyond it (complex-in-complex 9 deep — never seen in practice, the
    reference corpus peaks at 3) is truncated, tested explicitly in
    tests/test_ops.py.
    """
    frontier = nodes.select('node_id', F.col('node_json').alias('js'))
    per_level = [_level_concepts(frontier)]
    for _ in range(max_depth - 1):
        frontier = frontier.select(
            'node_id', F.explode(_json_child_nodes(F.col('js'))).alias('js'))
        per_level.append(_level_concepts(frontier))
    out = per_level[0]
    for level in per_level[1:]:
        out = out.unionByName(level)
    return out


def count_names_by_namespace(graph: KG, namespace) -> DataFrame:
    """Distinct names used per namespace, recursing into nested structures
    (node_summary.py:95-194)."""
    return (
        iter_node_concepts(graph.nodes)
        .where(F.col('namespace') == namespace)
        .groupBy('name').agg(F.count(F.lit(1)).alias('n_mentions'))
        .orderBy('name')
    )


def get_unused_namespaces(graph: KG, defined_namespaces) -> list:
    """Defined-but-unused namespaces (node_summary.py:75-93)."""
    used = {
        r['namespace']
        for r in iter_node_concepts(graph.nodes)
        .select('namespace').distinct().collect()
    }
    return sorted(set(defined_namespaces) - used)


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


def stratify_edges_by_annotation(graph: KG, key: str) -> DataFrame:
    """Edges exploded per value of one annotation key, with a sentinel for
    edges lacking it (reference struct/grouping/annotations.py:18-66).
    Write with ``.write.partitionBy('annotation_value')`` to materialize one
    subgraph per value — partition pruning then serves per-value reads."""
    values = F.coalesce(
        F.col('annotations').getItem(key),
        F.array(F.lit('__missing__')),
    )
    return (
        graph.edges
        .withColumn('annotation_value', F.explode(values))
    )


def write_subgraphs_by_annotation(graph: KG, key: str, path: str) -> None:
    """Materialize annotation-stratified subgraphs as a partitioned table."""
    (stratify_edges_by_annotation(graph, key)
     .write.mode('overwrite').partitionBy('annotation_value').parquet(path))


def stratify_edges_by_citation(graph: KG) -> DataFrame:
    """Edges keyed by citation for per-citation subgraph writes
    (struct/grouping/provenance.py:15)."""
    return graph.edges.withColumn(
        'citation_key',
        F.when(F.col('citation_db').isNull(), F.lit('__unqualified__'))
        .otherwise(F.concat_ws(':', 'citation_db', 'citation_id')))


def count_metaedges(graph: KG) -> DataFrame:
    """Edge histogram by canonical meta-edge: (relation, subject-modifier
    kind, object-modifier kind) — reference edge_summary.py:155-170."""
    return (
        graph.edges
        .groupBy('relation',
                 F.coalesce('subject_modifier_kind', F.lit('-'))
                 .alias('subject_modifier_kind'),
                 F.coalesce('object_modifier_kind', F.lit('-'))
                 .alias('object_modifier_kind'))
        .agg(F.count(F.lit(1)).alias('n_edges'))
        .orderBy('relation', 'subject_modifier_kind', 'object_modifier_kind')
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


def count_naked_names(warnings: DataFrame) -> DataFrame:
    """Histogram of names used without a namespace (errors.py:count_naked_names);
    the name is the first element of the warning's detail payload."""
    return (
        warnings
        .where(F.col('error_class') == 'NakedNameWarning')
        .select(F.get_json_object('detail', '$[0]').alias('name'))
        .groupBy('name').agg(F.count(F.lit(1)).alias('n_warnings'))
        .orderBy('name')
    )


def calculate_incorrect_names(warnings: DataFrame) -> DataFrame:
    """{namespace → names that failed lookup}
    (errors.py:calculate_incorrect_name_dict)."""
    return (
        warnings
        .where(F.col('error_class').isin(
            ['MissingNamespaceNameWarning', 'MissingNamespaceRegexWarning']))
        .select(F.get_json_object('detail', '$[0]').alias('namespace'),
                F.get_json_object('detail', '$[1]').alias('name'))
        .groupBy('namespace')
        .agg(F.sort_array(F.collect_set('name')).alias('names'))
        .orderBy('namespace')
    )


def graph_summary(graph: KG, warnings: DataFrame = None) -> dict:
    """graph.py:770-796 summarize.
    Density = E / (V * (V - 1)) for a directed multigraph's simple projection."""
    from .components import count_components

    n = graph.nodes.count()
    m = graph.edges.count()
    out = {
        'nodes': n,
        'edges': m,
        'density': (m / (n * (n - 1))) if n > 1 else 0.0,
        'citations': count_citations(graph),
        'components': count_components(graph),
    }
    if 'citation_authors' in graph.edges.columns:
        from ..citations import number_of_authors
        out['authors'] = number_of_authors(graph)
    if warnings is not None:
        out['warnings'] = warnings.count()
    return out


def edge_provenance(parsed: DataFrame) -> DataFrame:
    """Support/attestation statistics per logical edge (source, relation,
    target) across the whole crawl — the KG-construction step that turns
    per-document extractions into a weighted knowledge graph.

    The reference keeps full per-edge provenance (citation/evidence dicts on
    every BELGraph edge, struct/summary's citation counters); at web scale
    the useful form is the aggregate: how many documents assert the edge
    (``n_docs``), how many distinct qualified variants exist — different
    citation/annotation/modifier contexts hash to different content keys —
    (``n_variants``), how many distinct citations back it (``n_citations``),
    and a deterministic sample evidence string (``first_evidence`` = min).

    Input is the pre-explode compile result (one row per document), NOT the
    globally deduped edge table: first-writer-wins dedup keeps one
    provenance document per content key and would undercount n_docs.

    Scale: one exchange, partially aggregated, keyed by the logical-edge
    triple — the same key cardinality as the output KG. The three distinct
    aggregates share a single Expand+HashAggregate (no extra shuffle).
    """
    inst = (
        parsed
        .select('url', F.explode('edges').alias('e'))
        .select(
            'url', F.col('e.edge_id').alias('edge_id'),
            F.col('e.source_bel').alias('source'),
            F.col('e.relation').alias('relation'),
            F.col('e.target_bel').alias('target'),
            F.col('e.citation_db').alias('citation_db'),
            F.col('e.citation_id').alias('citation_id'),
            F.col('e.evidence').alias('evidence'),
        )
    )
    citation_key = F.when(
        F.col('citation_id').isNotNull(),
        F.concat(F.coalesce(F.col('citation_db'), F.lit('')),
                 F.lit(':'), F.col('citation_id')))
    return (
        inst.groupBy('source', 'relation', 'target')
        .agg(
            F.countDistinct('url').alias('n_docs'),
            F.countDistinct('edge_id').alias('n_variants'),
            F.countDistinct(citation_key).alias('n_citations'),
            F.min('evidence').alias('first_evidence'),
        )
    )
