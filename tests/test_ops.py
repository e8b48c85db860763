"""Graph-ops layer tests, validated against the frozen per-unit goldens."""
import pytest
from pyspark.sql import functions as F

from pybel_spark.corpus import CorpusSpec, generate_documents
from pybel_spark.ops import (
    KG, Pipeline, collapse, deletion, filters, induction, inference,
    node_intersection, summary, union,
)
from pybel_spark.pipeline import build_graph

N_DOCS = 120


@pytest.fixture(scope='module')
def kg(spark):
    docs = generate_documents(spark, N_DOCS, partitions=4)
    result = build_graph(docs)
    graph = KG(result.nodes, result.edges).persist()
    graph.count()
    yield graph


@pytest.fixture(scope='module')
def spec():
    return CorpusSpec()


def expected_edge_multiset(spec, n_docs):
    """Global (deduped) edge set reconstructed from per-unit goldens."""
    edges = {}
    for i in range(n_docs):
        for idx in spec.unit_indices(i):
            for e in spec.units[idx]['golden']['edges']:
                edges[e['edge_sig']] = e
    return edges


def test_count_functions(kg, spec):
    expected = {}
    seen = set()
    for i in range(N_DOCS):
        for idx in spec.unit_indices(i):
            for node in spec.units[idx]['golden']['nodes']:
                if node['bel'] not in seen:
                    seen.add(node['bel'])
                    expected[node['function']] = expected.get(node['function'], 0) + 1
    got = {r['function']: r['n_nodes'] for r in summary.count_functions(kg).collect()}
    assert got == expected


def test_count_relations(kg, spec):
    edges = expected_edge_multiset(spec, N_DOCS)
    expected = {}
    for e in edges.values():
        expected[e['relation']] = expected.get(e['relation'], 0) + 1
    got = {r['relation']: r['n_edges'] for r in summary.count_relations(kg).collect()}
    assert got == expected


def test_top_hubs(kg, spec):
    edges = expected_edge_multiset(spec, N_DOCS)
    degree = {}
    for e in edges.values():
        degree[e['source']] = degree.get(e['source'], 0) + 1
        degree[e['target']] = degree.get(e['target'], 0) + 1
    expected = sorted(degree.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r['node_bel'], r['degree'])
           for r in summary.get_top_hubs(kg, n=10).collect()]
    assert got == expected


def test_pubmed_identifiers(kg, spec):
    edges = expected_edge_multiset(spec, N_DOCS)
    expected = sorted({
        e['citation_id'] for e in edges.values()
        if e['citation_db'] == 'PubMed'
    })
    got = [r['pmid'] for r in summary.get_pubmed_identifiers(kg).collect()]
    assert got == expected


def test_filter_causal(kg, spec):
    edges = expected_edge_multiset(spec, N_DOCS)
    expected = sum(1 for e in edges.values()
                   if e['relation'] in ('increases', 'directlyIncreases',
                                        'decreases', 'directlyDecreases',
                                        'regulates'))
    got = kg.edges.where(filters.is_causal_relation()).count()
    assert got == expected


def test_collapse_all_variants(kg):
    collapsed = collapse.collapse_all_variants(kg)
    assert collapsed.nodes.where(filters.has_variant()).count() == 0
    # hasVariant self-references are dropped by the rewrite
    assert collapsed.edges.where(
        F.col('source_id') == F.col('target_id')).count() == 0
    assert collapsed.nodes.count() < kg.nodes.count()


def test_collapse_to_genes(kg):
    collapsed = collapse.collapse_to_genes(kg)
    remaining = {r['function'] for r in collapsed.nodes.select('function')
                 .distinct().collect()}
    # any protein/RNA left has no same-concept gene in the graph
    genes = {(r['namespace'], r['name']) for r in kg.nodes
             .where('function = "Gene"').select('namespace', 'name').collect()}
    leftover = collapsed.nodes.where(
        F.col('function').isin(['Protein', 'RNA', 'miRNA'])
        & F.col('namespace').isNotNull()).collect()
    for row in leftover:
        assert (row['namespace'], row['name']) not in genes


def test_induction_by_neighborhood(kg):
    seed = kg.nodes.where("name = 'AKT1' and function = 'Protein'") \
        .select('node_id')
    sub = induction.get_subgraph_by_neighborhood(kg, seed)
    seed_ids = {r['node_id'] for r in seed.collect()}
    rows = sub.edges.select('source_id', 'target_id').collect()
    assert rows
    for row in rows:
        assert row['source_id'] in seed_ids or row['target_id'] in seed_ids


def test_induction_by_annotation(kg):
    sub = induction.get_subgraph_by_annotation_value(kg, 'Species', '9606')
    assert sub.edges.count() > 0
    for row in sub.edges.select('annotations').collect():
        assert '9606' in row['annotations']['Species']


def test_remove_pathologies(kg):
    cleaned = deletion.remove_pathologies(kg)
    assert cleaned.nodes.where("function = 'Pathology'").count() == 0


def test_remove_isolated_nodes(kg):
    cleaned = deletion.remove_isolated_nodes(kg)
    degrees = deletion.node_degrees(cleaned)
    assert degrees.where('degree = 0').count() == 0


def test_union_idempotent(kg):
    doubled = union([kg, kg])
    assert doubled.nodes.count() == kg.nodes.count()
    assert doubled.edges.count() == kg.edges.count()


def test_node_intersection_self(kg):
    both = node_intersection(kg, kg)
    assert both.nodes.count() == kg.nodes.count()


def test_enrich_rnas_with_genes(kg):
    enriched = inference.enrich_rnas_with_genes(kg)
    rnas = kg.nodes.where(
        (F.col('function') == 'RNA') & F.col('variant_kinds').isNull()
        & ~F.col('has_fusion') & F.col('namespace').isNotNull())
    n_new_expected = rnas.count()
    assert n_new_expected > 0
    # every reference RNA now has a transcribedTo in-edge from its gene
    transcribed = enriched.edges.where("relation = 'transcribedTo'")
    rna_ids = {r['node_id'] for r in rnas.collect()}
    covered = {r['target_id'] for r in transcribed.collect()}
    assert rna_ids <= covered


def test_metaedges_and_citation_stratification(kg):
    meta = summary.count_metaedges(kg).collect()
    assert sum(r['n_edges'] for r in meta) == kg.edges.count()
    kinds = {(r['relation'], r['subject_modifier_kind'],
              r['object_modifier_kind']) for r in meta}
    assert any(k[1] == 'Activity' or k[2] == 'Activity' for k in kinds)
    strat = summary.stratify_edges_by_citation(kg)
    keys = {r['citation_key'] for r in
            strat.select('citation_key').distinct().collect()}
    assert '__unqualified__' in keys
    assert any(k.startswith('PubMed:') for k in keys)


def test_stratify_by_annotation(kg, tmp_path):
    strat = summary.stratify_edges_by_annotation(kg, 'Species')
    values = {r['annotation_value'] for r in
              strat.select('annotation_value').distinct().collect()}
    assert '9606' in values and '__missing__' in values
    path = str(tmp_path / 'by_species')
    summary.write_subgraphs_by_annotation(kg, 'Species', path)
    spark = kg.edges.sparkSession
    human = spark.read.parquet(path).where("annotation_value = '9606'")
    assert human.count() > 0
    # partition pruning: the filter appears as a partition filter in the scan
    plan = human._jdf.queryExecution().executedPlan().toString()
    assert 'annotation_value' in plan


def test_error_analytics(spark):
    """Naked-name and incorrect-name analytics read the warnings detail."""
    from pybel_spark.corpus import generate_documents
    from pybel_spark.pipeline import build_graph

    result = build_graph(generate_documents(spark, 60, partitions=2))
    warnings = result.warnings
    types = summary.count_error_types(warnings).collect()
    assert types
    incorrect = summary.calculate_incorrect_names(warnings).collect()
    # the slushy pool includes p(HGNC:missing)
    by_ns = {r['namespace']: r['names'] for r in incorrect}
    assert 'missing' in by_ns.get('HGNC', [])
    naked = summary.count_naked_names(warnings).collect()
    assert any(r['name'] == 'AKT1' for r in naked)


def test_count_names_by_namespace_recursive(kg, spec):
    """Concept recursion covers fusion partners / variants / members."""
    got = {r['name'] for r in
           summary.count_names_by_namespace(kg, 'HGNC').collect()}
    # TMPRSS2 only appears inside fusion nodes — flat namespace counting
    # would miss it
    assert 'TMPRSS2' in got
    assert 'AKT1' in got


def test_bfs_and_all_shortest_paths(kg):
    from pybel_spark.ops import paths

    akt1 = kg.nodes.where(
        "name = 'AKT1' and function = 'Protein' and variant_kinds is null"
    ).select('node_id')
    akt1_id = akt1.collect()[0]['node_id']
    dist = paths.bfs_distances(kg, [akt1_id], max_hops=2, directed=False)
    rows = {r['node_id']: r['distance'] for r in dist.collect()}
    assert rows[akt1_id] == 0
    assert any(d == 1 for d in rows.values())

    egfr_id = kg.nodes.where(
        "name = 'EGFR' and function = 'Protein' and variant_kinds is null"
    ).collect()[0]['node_id']
    sub = paths.get_subgraph_by_all_shortest_paths(kg, [akt1_id, egfr_id])
    sub_ids = {r['node_id'] for r in sub.nodes.collect()}
    assert akt1_id in sub_ids and egfr_id in sub_ids
    assert len(sub_ids) < kg.nodes.count()


def test_pipeline_registry_roundtrip(kg):
    p = Pipeline().append('remove_associations').append('collapse_all_variants')
    p2 = Pipeline.from_json(p.to_json())
    result = p2.run(kg)
    assert result.edges.where("relation = 'association'").count() == 0
    assert result.nodes.where(filters.has_variant()).count() == 0


# ------------------------- connected components ------------------------- #

def _nx_digraph(kg_):
    import networkx as nx
    g = nx.DiGraph()
    g.add_nodes_from(r['node_id'] for r in kg_.nodes.select('node_id').collect())
    g.add_edges_from((r['source_id'], r['target_id'])
                     for r in kg_.edges.select('source_id', 'target_id').collect())
    return g


def test_connected_components_networkx_parity(kg):
    import networkx as nx
    from pybel_spark.ops import components

    nxg = _nx_digraph(kg)
    expected = {frozenset(c) for c in nx.weakly_connected_components(nxg)}
    labels = components.connected_components(kg).collect()
    got = {}
    for r in labels:
        got.setdefault(r['component'], set()).add(r['node_id'])
    assert {frozenset(v) for v in got.values()} == expected
    # label is the lexicographic min of each component
    assert all(comp == min(members) for comp, members in got.items())
    assert components.count_components(kg) == len(expected)


def test_largest_component(kg):
    import networkx as nx
    from pybel_spark.ops import components

    nxg = _nx_digraph(kg)
    biggest = max(nx.weakly_connected_components(nxg), key=len)
    sub = components.get_largest_component(kg)
    assert {r['node_id'] for r in sub.nodes.select('node_id').collect()} \
        == biggest


def test_left_outer_join_components(kg, spark):
    """h-components touching g survive; untouched components are dropped
    (reference operations.py:74-96)."""
    import networkx as nx
    from pybel_spark.ops import components

    nxg = _nx_digraph(kg)
    comps = sorted(nx.weakly_connected_components(nxg), key=len)
    assert len(comps) >= 2, 'corpus graph must have >1 component for this test'
    seed_comp = comps[-1]

    # g = one edge from the largest component; h = the full graph
    seed_nodes = spark.createDataFrame(
        [(n,) for n in sorted(seed_comp)[:2]], ['node_id'])
    from pybel_spark.ops.graph import induce_by_nodes
    g = induce_by_nodes(kg, seed_nodes)

    joined = components.left_outer_join(g, kg)
    got_nodes = {r['node_id'] for r in joined.nodes.select('node_id').collect()}
    assert got_nodes == set(seed_comp)
    # edges: exactly the h-edges within the kept component
    expected_edges = {
        (r['source_id'], r['target_id'])
        for r in kg.edges.select('source_id', 'target_id').collect()
        if r['source_id'] in seed_comp and r['target_id'] in seed_comp
    }
    got_edges = {(r['source_id'], r['target_id'])
                 for r in joined.edges.select('source_id', 'target_id').collect()}
    assert got_edges == expected_edges


def test_degree_based_node_predicates(kg):
    """Same node sets as the reference predicates select
    (node_predicates.py:192-260), recomputed via networkx."""
    from pybel_spark.bel.constants import CAUSAL_RELATIONS

    causal = [(r['source_id'], r['target_id'])
              for r in kg.edges.where(
                  F.col('relation').isin(sorted(CAUSAL_RELATIONS)))
              .select('source_id', 'target_id').collect()]
    has_in = {t for _, t in causal}
    has_out = {s for s, _ in causal}

    assert {r['node_id'] for r in filters.has_causal_in_edges_ids(kg).collect()} == has_in
    assert {r['node_id'] for r in filters.has_causal_out_edges_ids(kg).collect()} == has_out
    assert {r['node_id'] for r in filters.is_causal_source_ids(kg).collect()} \
        == has_out - has_in
    assert {r['node_id'] for r in filters.is_causal_sink_ids(kg).collect()} \
        == has_in - has_out
    assert {r['node_id'] for r in filters.is_causal_central_ids(kg).collect()} \
        == has_in & has_out
    assert has_out - has_in, 'expect at least one causal source in corpus'

    # inclusion/exclusion builders
    some = sorted(has_in)[:3]
    ids_df = kg.nodes.sparkSession.createDataFrame([(i,) for i in some], ['node_id'])
    sel = filters.select_nodes_by_ids(kg.nodes, ids_df)
    assert {r['node_id'] for r in sel.select('node_id').collect()} == set(some)
    exc = filters.exclude_nodes_by_ids(kg.nodes, ids_df)
    assert {r['node_id'] for r in exc.select('node_id').collect()} \
        == {r['node_id'] for r in kg.nodes.select('node_id').collect()} - set(some)


def test_graph_summary_components(kg):
    from pybel_spark.ops import components

    s = summary.graph_summary(kg)
    assert s['components'] == components.count_components(kg)
    assert s['nodes'] > 0 and s['edges'] > 0


def test_random_subgraph_weighted_walk(kg):
    """Reference random_subgraph semantics: seeded, deterministic, edge
    count honored, result is edge-induced, connected growth from seeds."""
    from pybel_spark.ops import sample

    total = kg.edges.count()
    sub = sample.get_random_subgraph(kg, number_edges=20,
                                     number_seed_edges=3, seed=7)
    n = sub.edges.count()
    assert n <= 20
    # determinism: same seed → same edge set
    sub2 = sample.get_random_subgraph(kg, number_edges=20,
                                      number_seed_edges=3, seed=7)
    assert {r['edge_id'] for r in sub.edges.collect()} \
        == {r['edge_id'] for r in sub2.edges.collect()}
    # different seed → (almost surely) different set
    sub3 = sample.get_random_subgraph(kg, number_edges=20,
                                      number_seed_edges=3, seed=8)
    assert {r['edge_id'] for r in sub.edges.collect()} \
        != {r['edge_id'] for r in sub3.edges.collect()}
    # nodes are exactly the endpoints
    endpoints = {r['source_id'] for r in sub.edges.collect()} \
        | {r['target_id'] for r in sub.edges.collect()}
    assert {r['node_id'] for r in sub.nodes.collect()} == endpoints
    # asking for more edges than exist returns the whole graph
    assert sample.get_random_subgraph(
        kg, number_edges=total + 10).edges.count() == total


def test_random_subgraph_via_seeding(kg):
    from pybel_spark.query import Seeding

    seeded = Seeding().append('sample', {'number_edges': 15, 'seed': 3}) \
        .run(kg)
    assert seeded.edges.count() <= 15


def test_connected_components_long_chain_converges(spark):
    """ADVICE r2: pointer doubling must converge a diameter-300 chain well
    inside the 50-round budget (plain hash-min would need ~300 rounds), and
    exhaustion must RAISE instead of returning wrong labels."""
    import pytest as _pytest
    from pybel_spark.ops import components
    from pybel_spark.ops.graph import KG

    n = 300
    ids = ['n{:04d}'.format(i) for i in range(n)]
    nodes = spark.createDataFrame([(i,) for i in ids], ['node_id'])
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)],
        ['source_id', 'target_id'])
    kg_ = KG(nodes, edges)
    labels = components.connected_components(kg_, max_iterations=15)
    got = {r['component'] for r in labels.collect()}
    assert got == {'n0000'}

    with _pytest.raises(RuntimeError, match='did not converge'):
        components.connected_components(kg_, max_iterations=2)


def test_iter_node_concepts_column_native_deep_nesting(spark):
    """The unrolled-JSON concept walk: members-in-members, fusion
    partners, variants — and explicit truncation past max_depth."""
    import json

    def prot(name, variants=None):
        d = {'function': 'Protein',
             'concept': {'namespace': 'HGNC', 'name': name}}
        if variants:
            d['variants'] = variants
        return d

    nested = {'function': 'Complex', 'members': [
        prot('A', variants=[{'kind': 'hgvs',
                             'concept': {'namespace': 'VAR', 'name': 'v1'}}]),
        {'function': 'Complex', 'members': [
            prot('B'),
            {'function': 'Reaction',
             'reactants': [prot('C')],
             'products': [{'function': 'Gene', 'fusion': {
                 'partner_5p': prot('D'),
                 'partner_3p': prot('E')}}]},
        ]},
    ]}
    nodes = spark.createDataFrame(
        [('n1', json.dumps(nested))], ['node_id', 'node_json'])
    got = sorted((r['namespace'], r['name'])
                 for r in summary.iter_node_concepts(nodes).collect())
    assert got == [('HGNC', n) for n in 'ABCDE'] + [('VAR', 'v1')]

    # chain deeper than max_depth truncates (documented bound)
    chain = prot('LEAF')
    for _ in range(9):
        chain = {'function': 'Complex', 'members': [chain]}
    deep = spark.createDataFrame(
        [('n2', json.dumps(chain))], ['node_id', 'node_json'])
    assert summary.iter_node_concepts(deep, max_depth=8).count() == 0
    assert summary.iter_node_concepts(deep, max_depth=12).count() == 1
