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


class TestEutilsRecorded:
    """The real eSummary protocol path against a recorded response fixture
    (tests/golden/eutils_esummary_recorded.json, authentic eSummary v2
    shape): URL/batching, envelope parsing, author extraction, date
    sanitization, error records — only the socket is faked."""

    FIXTURE = 'tests/golden/eutils_esummary_recorded.json'

    def _payload(self):
        import json

        with open(self.FIXTURE, 'rb') as f:
            return json.loads(f.read().decode('utf8'))

    def _transport(self, log=None):
        """Replay the recorded response, filtered to the requested ids —
        exactly what the live service returns per request."""
        import json

        recorded = self._payload()

        def transport(method, url):
            assert method == 'GET'
            if log is not None:
                log.append(url)
            base, ids = url.split('&id=')
            assert base == ('https://eutils.ncbi.nlm.nih.gov/entrez/eutils/'
                            'esummary.fcgi?db=pubmed&retmode=json')
            wanted = ids.split(',')
            result = {'uids': [u for u in recorded['result']['uids']
                               if u in wanted]}
            for u in result['uids']:
                result[u] = recorded['result'][u]
            return json.dumps({'header': recorded['header'],
                               'result': result}).encode('utf8')

        return transport

    def test_parse_recorded_response(self):
        recs = citations.parse_esummary_response(self._payload())
        assert set(recs) == {'26438529', '20064923', '11027130',
                             '23455817', '29949567'}  # error pmid dropped
        r = recs['26438529']
        # CollectiveName entries are not authors
        assert r['authors'] == ['Hornbeck PV', 'Zhang B', 'Murray B']
        assert r['first'] == 'Hornbeck PV' and r['last'] == 'Murray B'
        assert r['journal'] == 'Nucleic Acids Research'
        assert (r['volume'], r['issue'], r['pages']) == ('43', 'D1', 'D512-20')
        assert r['date'] == '2015-12-10'
        assert recs['20064923']['date'] == '2010-04-01'   # YYYY Mon
        assert recs['11027130']['date'] == '2000-01-01'   # YYYY
        assert recs['23455817']['date'] == '2013-03-01'   # YYYY Season
        assert recs['29949567']['date'] == '2018-01-01'   # YYYY Mon-Mon

    def test_sanitize_pubdate_formats(self):
        cases = {
            '2015 Feb 12': '2015-02-12',
            '1999 Dec': '1999-12-01',
            '2008': '2008-01-01',
            '2012 Spring': '2012-03-01',
            '2020 Jan-Feb': '2020-01-01',
            '2017 Jun 5-12': '2017-06-05',
            '2019 Dec 30-Jan 5': '2019-12-30',
            'In press': None,
            '2015 Foo': None,
            '': None,
            '2015 Feb 31': None,  # impossible date
        }
        for raw, want in cases.items():
            assert citations.sanitize_pubdate(raw) == want, raw

    def test_resolver_batches_requests(self):
        urls = []
        resolver = citations.eutils_resolver(self._transport(urls),
                                             group_size=2)
        recs = resolver(['26438529', '20064923', '11027130', '23455817',
                         '29949567', '99999999'])
        assert len(urls) == 3  # 6 pmids / group_size 2
        assert all(len(u.split('&id=')[1].split(',')) <= 2 for u in urls)
        assert set(recs) == {'26438529', '20064923', '11027130',
                             '23455817', '29949567'}

    def _edges(self, spark):
        rows = [
            ('e1', 'PubMed', '26438529', None),
            ('e2', 'PubMed', '20064923', None),
            ('e3', 'PubMed', '55555555', None),   # not in the fixture
            ('e4', 'DOI', '10.1000/xyz', None),   # non-PubMed: untouched
        ]
        return spark.createDataFrame(
            rows, 'edge_id string, citation_db string, citation_id string, '
                  'citation_authors array<string>')

    def test_enrich_through_spark_with_recorded_fixture(self, spark):
        edges = self._edges(spark)
        resolver = citations.authors_only(
            citations.eutils_resolver(self._transport()))
        got = {r['edge_id']: r['citation_authors']
               for r in citations.enrich_pubmed_citations(
                   edges, resolver=resolver).collect()}
        assert got['e1'] == ['Hornbeck PV', 'Zhang B', 'Murray B']
        assert got['e2'] == ['Kauwe JS', 'Cruchaga C']
        assert got['e3'] is None  # unresolved pmid stays null
        assert got['e4'] is None  # non-PubMed untouched

    def test_citation_metadata_table_through_spark(self, spark):
        edges = self._edges(spark)
        resolver = citations.eutils_resolver(self._transport())
        meta = {r['citation_id']: r
                for r in citations.resolve_citation_metadata(
                    edges, resolver).collect()}
        assert set(meta) == {'26438529', '20064923', '55555555'}
        assert meta['26438529']['journal'] == 'Nucleic Acids Research'
        assert meta['26438529']['date'] == '2015-12-10'
        assert meta['20064923']['first_author'] == 'Kauwe JS'
        assert meta['55555555']['title'] is None
