"""Citation-author enrichment tests (reference manager/citation_utils.py
and graph.py:316-325)."""
import pytest
from pyspark.sql import functions as F

from pybel_spark import citations, io_formats
from pybel_spark.corpus import generate_documents
from pybel_spark.ops import KG, filters
from pybel_spark.pipeline import build_graph

N_DOCS = 60


@pytest.fixture(scope='module')
def result(spark):
    docs = generate_documents(spark, N_DOCS, partitions=4)
    r = build_graph(docs)
    r.parsed = r.parsed.persist()
    r.parsed.count()
    yield r


def test_parse_leaves_authors_null(result):
    """Parsing never invents authors — they only come from enrichment."""
    assert 'citation_authors' in result.edges.columns
    assert result.edges.where(F.col('citation_authors').isNotNull()).count() == 0


def test_enrich_pubmed_citations(spark, result):
    enriched = citations.enrich_pubmed_citations(result.edges)

    pubmed = enriched.where(F.col('citation_db') == 'PubMed')
    assert pubmed.where(F.col('citation_authors').isNull()).count() == 0
    assert enriched.where(
        (F.col('citation_db') != 'PubMed') | F.col('citation_db').isNull()
    ).where(F.col('citation_authors').isNotNull()).count() == 0

    # deterministic: same pmid → same author list, matching the fake resolver
    rows = pubmed.select('citation_id', 'citation_authors').collect()
    expected = citations.fake_pubmed_resolver(
        {r['citation_id'] for r in rows})
    for r in rows:
        assert list(r['citation_authors']) == expected[r['citation_id']]

    # counts consistent with a driver-side recomputation
    all_authors = {a for v in expected.values() for a in v}
    assert citations.number_of_authors(enriched) == len(all_authors)
    hist = {r['author']: r['n_edges']
            for r in citations.count_authors(enriched).collect()}
    assert set(hist) == all_authors


def test_author_predicates(spark, result):
    enriched = citations.enrich_pubmed_citations(result.edges).persist()
    some = enriched.where(filters.has_authors()) \
        .select('citation_authors').first()
    author = some['citation_authors'][0]
    matched = enriched.where(filters.author_inclusion(author))
    assert matched.count() > 0
    assert all(author in r['citation_authors']
               for r in matched.select('citation_authors').collect())
    assert enriched.where(
        filters.author_inclusion('Nobody Qzx')).count() == 0
    enriched.unpersist()


def test_authors_survive_nodelink_roundtrip(spark, result):
    enriched = citations.enrich_pubmed_citations(result.edges)
    kg = KG(result.nodes, enriched)
    payload = io_formats.to_nodelink(kg.nodes, kg.edges)
    assert any((link.get('citation') or {}).get('authors')
               for link in payload['links'])
    _nodes2, edges2 = io_formats.from_nodelink(spark, payload)
    a = {(r['edge_id'], tuple(r['citation_authors'] or ()))
         for r in enriched.select('edge_id', 'citation_authors').collect()}
    b = {(r['edge_id'], tuple(r['citation_authors'] or ()))
         for r in edges2.select('edge_id', 'citation_authors').collect()}
    assert a == b


def test_graph_summary_authors(result):
    from pybel_spark.ops import summary

    enriched = citations.enrich_pubmed_citations(result.edges)
    s = summary.graph_summary(KG(result.nodes, enriched))
    assert s['authors'] == citations.number_of_authors(enriched)
    assert s['authors'] > 0


# ------------------------- join-based grounding ------------------------- #

def test_ground_concepts_join(spark, result):
    """Join grounding agrees with the in-parser broadcast-dict grounding:
    every concept the compiler grounded resolves; broadcast and salted
    shuffle paths give identical results."""
    from pybel_spark import grounding
    from pybel_spark.corpus import CorpusSpec, load_corpus_catalog

    header = CorpusSpec().header
    urls = {}
    for line in header:
        if line.startswith('DEFINE NAMESPACE') and ' AS URL ' in line:
            kw = line.split()[2]
            urls[kw] = line.split('"')[1]
    terms = grounding.namespace_terms_table(
        spark, load_corpus_catalog(), urls)

    broadcast = grounding.ground_concepts_join(
        result.nodes, terms, broadcast_terms=True)
    shuffled = grounding.ground_concepts_join(
        result.nodes, terms, broadcast_terms=False, salt_buckets=8)

    rows_b = sorted(map(tuple, broadcast.collect()))
    rows_s = sorted(map(tuple, shuffled.collect()))
    assert rows_b == rows_s

    # the compiler only emits URL-namespace concepts it grounded (regex
    # namespaces like dbSNP aren't in the terms table)
    url_ns = broadcast.where(F.col('namespace').isin(list(urls)))
    assert url_ns.where(~F.col('is_grounded')).count() == 0
    assert url_ns.count() > 0

    report = grounding.grounding_report(result.nodes, terms)
    by_ns = {r['namespace']: r for r in report.collect()}
    for ns, row in by_ns.items():
        if ns in urls:
            assert row['hit_rate'] == 1.0
