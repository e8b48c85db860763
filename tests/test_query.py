"""Query/seeding system tests."""
import pytest
from pyspark.sql import functions as F

from pybel_spark.corpus import generate_documents
from pybel_spark.ops import KG
from pybel_spark.pipeline import build_graph
from pybel_spark.query import Query, Seeding


@pytest.fixture(scope='module')
def universe(spark):
    docs = generate_documents(spark, 100, partitions=4)
    result = build_graph(docs)
    graph = KG(result.nodes, result.edges).persist()
    graph.count()
    yield graph


def akt1_ids(universe):
    return universe.nodes.where(
        "name = 'AKT1' and function = 'Protein' and variant_kinds is null"
    ).select('node_id')


def test_seeding_neighbors(universe):
    seeded = Seeding().append('neighbors', None).seeds
    q = Query(seeding=Seeding([{'type': 'neighbors',
                                'data': akt1_ids(universe)}]))
    result = q.run(universe)
    assert 0 < result.edges.count() < universe.edges.count()


def test_query_json_roundtrip(universe):
    q = Query()
    q.seeding.append('pubmed', ['10000', '10011'])
    q.pipeline.append('remove_associations')
    payload = q.to_json()
    q2 = Query.from_json(payload)
    result = q2.run(universe)
    cited = result.edges.select('citation_id').distinct().collect()
    assert {r['citation_id'] for r in cited} <= {'10000', '10011'}
    assert result.edges.where("relation = 'association'").count() == 0


def test_query_with_expansion(universe):
    q = Query(seeding=Seeding([{'type': 'pubmed', 'data': ['10000']}]))
    q.pipeline.append('expand_all_node_neighborhoods')
    seeded_only = Query(
        seeding=Seeding([{'type': 'pubmed', 'data': ['10000']}])).run(universe)
    expanded = q.run(universe)
    assert expanded.edges.count() >= seeded_only.edges.count()


def test_register_views_and_sql(spark, universe):
    from pybel_spark.query import register_views
    register_views(universe, spark)
    rows = spark.sql("""
        SELECT relation, count(*) AS n
        FROM kg_edges
        WHERE citation_db = 'PubMed'
        GROUP BY relation ORDER BY n DESC LIMIT 3
    """).collect()
    assert rows and all(r['n'] > 0 for r in rows)
    n_proteins = spark.sql(
        "SELECT count(*) AS n FROM kg_nodes WHERE function = 'Protein'"
    ).collect()[0]['n']
    assert n_proteins > 0


def test_query_edges_nodes(universe):
    from pybel_spark.query import query_edges, query_nodes
    increases = query_edges(universe, relation='increases')
    assert increases.count() > 0
    akt = query_nodes(universe, function='Protein', name_contains='akt')
    assert akt.count() > 0


def test_sample_seed_deterministic(universe):
    spec = [{'type': 'sample', 'data': {'fraction': 0.3, 'seed': 7}}]
    a = Query(seeding=Seeding(spec)).run(universe).edges.count()
    b = Query(seeding=Seeding(spec)).run(universe).edges.count()
    assert a == b
